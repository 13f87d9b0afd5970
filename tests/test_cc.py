"""Device connected-components (ops/cc.py) vs the host/native oracles.

The device op backs the headless page-box path: the page model's dilated
mask -> largest component -> bounding box, all on device (reference
decision chain main.py:394-404 at model resolution, DEVIATIONS.md #9).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sbb_textline_detection_tpu.ops import cc
from sbb_textline_detection_tpu.ops import contours as contour_ops


def _random_blob_mask(rng, h, w, n_blobs):
    m = np.zeros((h, w), np.uint8)
    for _ in range(n_blobs):
        bh = int(rng.integers(2, max(3, h // 3)))
        bw = int(rng.integers(2, max(3, w // 3)))
        y = int(rng.integers(0, h - bh + 1))
        x = int(rng.integers(0, w - bw + 1))
        m[y:y + bh, x:x + bw] = 1
    return m


@pytest.mark.parametrize("seed", range(8))
def test_label_partition_matches_host(seed):
    rng = np.random.default_rng(seed)
    m = _random_blob_mask(rng, 40, 56, int(rng.integers(1, 7)))
    dev = np.asarray(cc.label_components(jax.numpy.asarray(m)))
    host, n = contour_ops.label_components(m)
    # same partition: device labels and host labels must be in bijection
    assert (dev == 40 * 56).tolist() == (host == 0).tolist()
    pairs = {(int(a), int(b)) for a, b in zip(host.ravel(), dev.ravel())
             if a != 0}
    assert len(pairs) == n
    assert len({a for a, _ in pairs}) == n
    assert len({b for _, b in pairs}) == n


def test_label_noise_partition():
    rng = np.random.default_rng(99)
    m = (rng.random((64, 48)) < 0.45).astype(np.uint8)
    dev = np.asarray(cc.label_components(jax.numpy.asarray(m)))
    host, n = contour_ops.label_components(m)
    pairs = {(int(a), int(b)) for a, b in zip(host.ravel(), dev.ravel())
             if a != 0}
    assert len(pairs) == n == len({b for _, b in pairs})


def test_spiral_converges():
    # a long winding component exercises the while_loop fixpoint: label
    # propagation must cross every bend, not stop after a fixed sweep count
    m = np.zeros((41, 41), np.uint8)
    m[0, :] = 1
    for k in range(1, 20, 2):
        m[k * 2, k:41 - k] = 1
        m[k * 2 - 1, 41 - k - 1] = 1 if k % 4 == 1 else 0
        m[k * 2 + 1, k] = 1
    dev = np.asarray(cc.label_components(jax.numpy.asarray(m)))
    host, n = contour_ops.label_components(m)
    pairs = {(int(a), int(b)) for a, b in zip(host.ravel(), dev.ravel())
             if a != 0}
    assert len(pairs) == n == len({b for _, b in pairs})


@pytest.mark.parametrize("seed", range(8))
def test_largest_component_box_matches_host(seed):
    rng = np.random.default_rng(100 + seed)
    m = _random_blob_mask(rng, 48, 64, int(rng.integers(1, 6)))
    box, valid = jax.jit(cc.largest_component_box)(jax.numpy.asarray(m))
    assert bool(valid)
    labels, n = contour_ops.label_components(m)
    areas = [int((labels == i).sum()) for i in range(1, n + 1)]
    best = 1 + int(np.argmax(areas))
    ys, xs = np.nonzero(labels == best)
    assert list(np.asarray(box)) == [xs.min(), ys.min(),
                                     xs.max() - xs.min() + 1,
                                     ys.max() - ys.min() + 1]


def test_empty_mask_invalid():
    box, valid = jax.jit(cc.largest_component_box)(
        jax.numpy.zeros((32, 32), np.uint8))
    assert not bool(valid)
    assert list(np.asarray(box)) == [0, 0, 0, 0]


def test_page_box_agrees_with_model_res_oracle():
    """End-use parity: dilate(3)+largest-box on a realistic page mask must
    reproduce stages._page_box_model_res's decision (which ranks by contour
    polygon area — equal here because one border blob dominates)."""
    from sbb_textline_detection_tpu.ops import morphology
    from sbb_textline_detection_tpu.pipeline import stages
    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG

    rng = np.random.default_rng(5)
    small = np.zeros((448, 448), np.uint8)
    small[30:420, 40:400] = 1          # printspace blob
    small[2:6, 2:10] = 1               # speck off the border
    holes = rng.random((448, 448)) < 0.02
    small[holes & (small == 1)] = 0    # ragged prediction
    th, tw = 2800, 2100
    want = stages._page_box_model_res(small, th, tw, DEFAULT_CONFIG)

    dil = morphology.dilate(jax.numpy.asarray(small), 3, 1)
    box, valid = jax.jit(cc.largest_component_box)(dil)
    assert bool(valid)
    x, y, bw, bh = (int(v) for v in np.asarray(box))
    mh = mw = 448
    x0 = -(-x * tw // mw)
    x1 = -(-(x + bw) * tw // mw) - 1
    y0 = -(-y * th // mh)
    y1 = -(-(y + bh) * th // mh) - 1
    got = [x0, y0, max(1, x1 - x0 + 1), max(1, y1 - y0 + 1)]
    assert got == want


@pytest.mark.parametrize("seed", range(6))
def test_component_boxes_topk_covers_host_contour_boxes(seed):
    """The speculative-deskew contract: every host contour box that passes
    the reference area filter (main.py:465-481 semantics via
    stages.region_contours_and_boxes) must appear VERBATIM among the
    device top-k boxes when k covers the component count — value matching
    is exactly how the detector decides to trust a speculative slot."""
    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
    from sbb_textline_detection_tpu.pipeline import stages

    rng = np.random.default_rng(200 + seed)
    m = _random_blob_mask(rng, 80, 96, int(rng.integers(1, 8)))
    k = 16
    img_area = float(m.shape[0] * m.shape[1])
    min_area = 0.5 * DEFAULT_CONFIG.region.min_area_ratio * img_area
    boxes5 = np.asarray(jax.jit(
        lambda x: cc.component_boxes_topk(x, k, jnp_f32(min_area),
                                          jnp_f32(img_area)))(
        jax.numpy.asarray(m)))
    dev = {tuple(int(v) for v in b[:4]) for b in boxes5 if b[4]}
    _, host_boxes = stages.region_contours_and_boxes(m, DEFAULT_CONFIG)
    for x, y, w, h in host_boxes:
        assert (y, x, h, w) in dev
    # valid rows are compacted to the front and scan-ordered
    vflags = [int(b[4]) for b in boxes5]
    assert vflags == sorted(vflags, reverse=True)


def jnp_f32(v):
    import jax.numpy as jnp
    return jnp.float32(v)


def test_component_boxes_topk_filters_and_compacts():
    m = np.zeros((64, 64), np.uint8)
    m[2:30, 2:30] = 1          # big blob (784 px)
    m[40, 40] = 1              # single-pixel speck
    m[50:60, 45:60] = 1        # medium blob (150 px)
    import jax.numpy as jnp
    boxes5 = np.asarray(jax.jit(
        lambda x: cc.component_boxes_topk(x, 4, jnp.float32(2.0),
                                          jnp.float32(1e9)))(
        jnp.asarray(m)))
    assert boxes5[0].tolist() == [2, 2, 28, 28, 1]
    assert boxes5[1].tolist() == [50, 45, 10, 15, 1]   # speck filtered out
    assert boxes5[2].tolist() == [0, 0, 0, 0, 0]
    assert boxes5[3].tolist() == [0, 0, 0, 0, 0]


def test_component_boxes_topk_truncates_beyond_k():
    m = np.zeros((16, 40), np.uint8)
    for i in range(5):
        m[2:5, 2 + 7 * i:6 + 7 * i] = 1
    import jax.numpy as jnp
    boxes5 = np.asarray(jax.jit(
        lambda x: cc.component_boxes_topk(x, 3, jnp.float32(1.0),
                                          jnp.float32(1e9)))(
        jnp.asarray(m)))
    # first 3 components in scan order; the last two simply absent
    assert [b.tolist() for b in boxes5] == [
        [2, 2, 3, 4, 1], [2, 9, 3, 4, 1], [2, 16, 3, 4, 1]]

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

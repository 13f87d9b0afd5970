"""Resident-canvas fused segmentation must be bit-identical to the
padded-crop-upload path: the canvas carries the whole scaled page plus
margin, the program whitens outside the runtime page box and slices tiles
at runtime offsets — every tile must read exactly the pixels the classic
path's padded crop gives it (including the Otsu histogram scope and the
morphology border masking)."""

import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import RuntimeConfig
from sbb_textline_detection_tpu.models import registry, runner

from tests.test_models import TINY


@pytest.fixture(scope="module")
def duo():
    variables = registry.init_variables(TINY, seed=0)
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    m_r = runner.SegmentationModel(TINY, variables, rt)
    m_t = runner.SegmentationModel(TINY, variables, rt)
    return m_r, m_t


MORPH = (("erode", 5, 1), ("dilate", 5, 2))
POST = (("open", 5, 1), ("close", 5, 1))


def _scaled_page(rng, h, w):
    return np.where(rng.uniform(size=(h, w, 3)) < 0.35, 40, 230
                    ).astype(np.uint8)


@pytest.mark.parametrize("boxes_hw", [
    # (scaled_h, scaled_w, by, bx, crop_h, crop_w) per page — crops at the
    # origin, interior, and flush with the page edges
    [(150, 120, 0, 0, 150, 120), (150, 120, 10, 7, 130, 100)],
    [(140, 110, 25, 15, 115, 95), (140, 110, 0, 3, 120, 107)],
])
def test_resident_matches_classic(duo, boxes_hw):
    m_r, m_t = duo
    rng = np.random.default_rng(42)
    scaleds = [_scaled_page(rng, sh, sw) for sh, sw, *_ in boxes_hw]
    crops = [s[by:by + ch, bx:bx + cw]
             for s, (_, _, by, bx, ch, cw) in zip(scaleds, boxes_hw)]
    grids = {m_r.grid_for(c.shape[0], c.shape[1]) for c in crops}
    assert len(grids) == 1, "test pages must share a tile grid"

    want = m_r.predict_dual_tiled_multi(
        m_t, crops, morph=MORPH, mask_class=1, post_morph=POST)

    canvases = [m_r.upload_canvas(s) for s in scaleds]
    boxes = [[by, bx, ch, cw] for (_, _, by, bx, ch, cw) in boxes_hw]
    got = m_r.predict_dual_tiled_resident(
        m_t, canvases, boxes, morph=MORPH, mask_class=1, post_morph=POST)

    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g[0], w[0], err_msg=f"region p{i}")
        np.testing.assert_array_equal(g[1], w[1], err_msg=f"textline p{i}")


def test_resident_single_page(duo):
    m_r, m_t = duo
    rng = np.random.default_rng(7)
    scaled = _scaled_page(rng, 160, 130)
    crop = scaled[12:142, 5:115]
    want = m_r.predict_dual_tiled(m_t, crop, morph=MORPH, mask_class=1,
                                  post_morph=POST)
    got = m_r.predict_dual_tiled_resident(
        m_t, [m_r.upload_canvas(scaled)], [[12, 5, 130, 110]],
        morph=MORPH, mask_class=1, post_morph=POST)[0]
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])

"""Stage-level tests: page-box model-resolution fast path vs the
full-resolution reference-shaped oracle (DEVIATIONS.md #9)."""

import numpy as np

from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.ops import resize as resize_ops
from sbb_textline_detection_tpu.pipeline import stages


def _boxes_for(small, h, w):
    """(model-res box mapped to full res, oracle box at full res)."""
    fast = stages._page_box_model_res(small, h, w, DEFAULT_CONFIG)
    labels_full = resize_ops.resize_nearest_host(small, h, w)
    oracle = stages._page_box_full_res(labels_full, DEFAULT_CONFIG)
    return fast, oracle


def test_page_box_matches_oracle_within_quantization():
    rng = np.random.default_rng(0)
    h, w = 2800, 2000
    mh, mw = 448, 448
    # quantization bound: 1 model px of morphology difference + the
    # upscale cell size, on each side
    tol_x = int(np.ceil(w / mw)) * 2
    tol_y = int(np.ceil(h / mh)) * 2
    # reference full-res dilate x6 of 5x5 expands each side by 12 px that
    # the model-res route approximates with its 1-px dilate
    tol_x += 12
    tol_y += 12
    for _ in range(5):
        small = np.zeros((mh, mw), np.uint8)
        y0, x0 = rng.integers(10, 100, 2)
        y1 = rng.integers(300, mh - 5)
        x1 = rng.integers(300, mw - 5)
        small[y0:y1, x0:x1] = 1
        # salt speckles (must not win the largest-area pick)
        ys, xs = rng.integers(0, mh, 20), rng.integers(0, mw, 20)
        small[ys, xs] = 1
        fast, oracle = _boxes_for(small, h, w)
        fx, fy, fw, fh = fast
        ox, oy, ow, oh = oracle
        assert abs(fx - ox) <= tol_x
        assert abs(fy - oy) <= tol_y
        assert abs((fx + fw) - (ox + ow)) <= tol_x
        assert abs((fy + fh) - (oy + oh)) <= tol_y


def test_page_box_degenerate_mask_falls_back():
    """extract_page must fall back to the whole image when the model
    yields an empty mask (reference main.py:406-426)."""

    class EmptyPage:
        def predict_whole_small(self, img):
            return np.zeros((448, 448), np.uint8)

    class Models:
        page = EmptyPage()

    img = np.full((900, 700, 3), 255, np.uint8)
    scaled = stages.ScaledImage(img, 900, 700, 1.0, 1.0)
    cropped, page_coord, cont_page = stages.extract_page(
        scaled, Models(), DEFAULT_CONFIG)
    assert cropped.shape[:2] == (899, 699)  # [0,0,w-1,h-1] box, as upstream

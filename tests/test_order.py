"""Reading-order tests."""

import numpy as np

from sbb_textline_detection_tpu.pipeline import order


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


def test_two_bands_left_to_right():
    # textline mask with two dense bands separated by a wide gap
    mask = np.zeros((600, 400), np.uint8)
    mask[50:200, 20:380] = 1
    mask[400:550, 20:380] = 1
    regions = [
        _rect(210, 420, 380, 540),   # bottom right   -> 3
        _rect(20, 60, 180, 190),     # top left       -> 0
        _rect(210, 60, 380, 190),    # top right      -> 1
        _rect(20, 420, 180, 540),    # bottom left    -> 2
    ]
    idx_sorted, matrix = order.order_of_regions(mask, regions)
    assert idx_sorted == [1, 2, 3, 0]
    order_of_texts, ids = order.order_and_id_of_texts(regions, matrix, idx_sorted)
    assert ids == ["r0", "r1", "r2", "r3"]
    # region 1 (top left) is first in reading order
    assert order_of_texts[1] == 0
    assert order_of_texts[2] == 1
    assert order_of_texts[3] == 2
    assert order_of_texts[0] == 3


def test_single_region():
    mask = np.zeros((200, 200), np.uint8)
    mask[40:160, 20:180] = 1
    regions = [_rect(20, 40, 180, 160)]
    idx_sorted, matrix = order.order_of_regions(mask, regions)
    assert idx_sorted == [0]
    oot, ids = order.order_and_id_of_texts(regions, matrix, idx_sorted)
    assert oot == [0] and ids == ["r0"]

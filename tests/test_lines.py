"""Tests for the projection-profile line separator."""

import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import LineSplitConfig
from sbb_textline_detection_tpu.pipeline import lines


def _striped_patch(h=400, w=600, n_lines=5, line_h=20):
    """Binary patch with n_lines horizontal stripes and the surrounding
    rectangle contour."""
    img = np.zeros((h, w), np.uint8)
    gap = h // (n_lines + 1)
    for i in range(1, n_lines + 1):
        y = i * gap
        img[y:y + line_h, 40:w - 40] = 1
    contour = np.array([[5, 5], [w - 5, 5], [w - 5, h - 5], [5, h - 5]])
    return img, contour


def test_separate_lines_counts_and_order():
    img, contour = _striped_patch(n_lines=5)
    peaks, boxes = lines.separate_lines(img, contour, 0.0)
    assert len(boxes) == 5
    tops = [b[:, 1].min() for b in boxes]
    assert tops == sorted(tops)          # emitted top-to-bottom
    for b in boxes:
        assert b.shape == (4, 2)
        assert b[:, 0].min() >= 0 and b[:, 1].min() >= 0


def test_separate_lines_x_extent_follows_contour():
    img, _ = _striped_patch(n_lines=4)
    # narrow contour: only the middle third of the patch
    w = img.shape[1]
    contour = np.array([[w // 3, 5], [2 * w // 3, 5],
                        [2 * w // 3, 390], [w // 3, 390]])
    _, boxes = lines.separate_lines(img, contour, 0.0)
    assert len(boxes) == 4
    for b in boxes:
        assert b[:, 0].max() <= 2 * w // 3 + 2
        assert b[:, 0].min() >= w // 3 - 2


def test_separate_lines_empty_patch_yields_nothing_or_raises():
    img = np.zeros((100, 100), np.uint8)
    contour = np.array([[0, 0], [99, 0], [99, 99], [0, 99]])
    try:
        _, boxes = lines.separate_lines(img, contour, 0.0)
        assert boxes == [] or len(boxes) <= 1
    except Exception:
        pass  # upstream maps exceptions to "no lines"


def test_vertical_single_peak_raises_like_reference():
    # One fat stripe -> single positive peak; the vertical variant's
    # single-peak branch is unbound upstream (main.py:1298-1301).
    img = np.zeros((200, 200), np.uint8)
    img[:, 90:110] = 1
    contour = np.array([[0, 0], [199, 0], [199, 199], [0, 199]])
    sigma_big = LineSplitConfig(sigma_fallback=30)
    with pytest.raises(Exception):
        peaks, _ = lines.separate_lines(img, contour, -90.0, sigma_big,
                                        vertical=True)
        if len(peaks) != 1:          # only the 1-peak branch must raise
            raise RuntimeError("test setup produced != 1 peak")


def test_two_line_case():
    img, contour = _striped_patch(h=300, n_lines=2, line_h=25)
    peaks, boxes = lines.separate_lines(img, contour, 0.0)
    assert len(boxes) == len(peaks)
    assert 1 <= len(boxes) <= 3


def test_rotated_boxes_roundtrip():
    """With theta=0 the rotation back into the page frame is the identity."""
    img, contour = _striped_patch(n_lines=3)
    _, boxes = lines.separate_lines(img, contour, 0.0)
    for b in boxes:
        assert b[0, 1] == b[1, 1]    # horizontal top edge
        assert b[2, 1] == b[3, 1]    # horizontal bottom edge
        assert b[0, 0] == b[3, 0]    # vertical left edge


def test_vertical_axis_fix_recovers_lines():
    """DEVIATIONS #14: a vertical-text region (tall narrow strokes) at
    slope -90 must yield ~one line box per stroke through
    stages.textline_postprocess with the default vertical_axis_fix — the
    reference-faithful vertical variant (fix off) profiles the axis
    perpendicular to the rotated text (main.py:1020) and yields almost
    nothing."""
    import dataclasses

    from sbb_textline_detection_tpu.core.config import (DEFAULT_CONFIG,
                                                        LineSplitConfig)
    from sbb_textline_detection_tpu.pipeline import stages

    # 8 vertical strokes, 24 px pitch, in a 360x220 crop
    crop = np.zeros((360, 220), np.uint8)
    for i in range(8):
        x = 20 + i * 24
        crop[20:340, x:x + 10] = 1
    contour = np.array([[0, 0], [219, 0], [219, 359], [0, 359]])
    box = [0, 0, 220, 360]  # [x, y, w, h]

    fixed = stages.textline_postprocess(crop, -90.0, contour, box,
                                        DEFAULT_CONFIG)
    assert 6 <= len(fixed) <= 10, f"fix found {len(fixed)} of 8 strokes"
    # each recovered quad must cover its stroke's center
    from sbb_textline_detection_tpu.ops import contours as contour_ops
    centers_x = np.array([25.0 + i * 24 for i in range(8)])
    centers_y = np.full(8, 180.0)
    covered = np.zeros(8, bool)
    for quad in fixed:
        covered |= contour_ops.points_in_polygon(
            np.asarray(quad, np.float64), centers_x, centers_y)
    assert covered.sum() >= 6

    cfg_ref = dataclasses.replace(
        DEFAULT_CONFIG,
        line_split=LineSplitConfig(vertical_axis_fix=False))
    broken = stages.textline_postprocess(crop, -90.0, contour, box, cfg_ref)
    assert len(broken) <= 2  # the preserved reference behavior


def test_band_filters_out_of_band_peaks_keeps_boxes_identical():
    """DEVIATIONS #17: junk stripes outside the contour band emit no
    line; every surviving box is BIT-IDENTICAL to the unfiltered run
    (the filter acts at emission only, after all spacing/strength
    logic)."""
    img, contour = _striped_patch(h=480, w=600, n_lines=5)
    img[6:18, 40:560] = 1          # neighbor-text junk above the contour
    img[466:478, 40:560] = 1       # and below
    contour = np.array([[5, 40], [595, 40], [595, 440], [5, 440]])
    _, plain = lines.separate_lines(img, contour, 0.0)
    _, banded = lines.separate_lines(img, contour, 0.0, band=(38.0, 442.0))
    assert len(plain) == 7
    assert len(banded) == 5
    tops = sorted(range(len(plain)), key=lambda i: plain[i][:, 1].min())
    kept = [plain[i] for i in tops[1:-1]]   # drop first/last (junk)
    kept_sorted = sorted(kept, key=lambda b: b[:, 1].min())
    banded_sorted = sorted(banded, key=lambda b: b[:, 1].min())
    for a, b in zip(banded_sorted, kept_sorted):
        np.testing.assert_array_equal(a, b)


def test_band_none_is_reference_faithful():
    img, contour = _striped_patch(n_lines=4)
    img[2:12, 40:560] = 1
    _, plain = lines.separate_lines(img, contour, 0.0)
    _, none_band = lines.separate_lines(img, contour, 0.0, band=None)
    assert len(plain) == len(none_band)
    for a, b in zip(plain, none_band):
        np.testing.assert_array_equal(a, b)


def test_contour_band_stage_flag():
    """stages._contour_band: on for the horizontal split, off for the
    reference-faithful vertical variant and when the flag is False."""
    import dataclasses

    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
    from sbb_textline_detection_tpu.pipeline import stages

    big = np.array([[10.0, 50.0], [200.0, 52.0], [200.0, 340.0],
                    [10.0, 338.0]])
    band = stages._contour_band(big, DEFAULT_CONFIG, vertical=False)
    assert band == (48.0, 342.0)
    assert stages._contour_band(big, DEFAULT_CONFIG, vertical=True) is None
    off = dataclasses.replace(
        DEFAULT_CONFIG, line_split=dataclasses.replace(
            DEFAULT_CONFIG.line_split, contour_peak_band=False))
    assert stages._contour_band(big, off, vertical=False) is None

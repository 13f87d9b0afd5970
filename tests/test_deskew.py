"""Deskew engine tests: angle recovery and parity with a rotate-and-score
numpy oracle transcribed from the reference formulas."""

import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import DeskewConfig
from sbb_textline_detection_tpu.ops import profiles, rotate
from sbb_textline_detection_tpu.pipeline import deskew


def _text_mask(h=220, w=300, n_lines=6, line_h=8):
    img = np.zeros((h, w), np.uint8)
    gap = h // (n_lines + 1)
    for i in range(1, n_lines + 1):
        img[i * gap:i * gap + line_h, 20:w - 20] = 1
    return img


def _oracle_score(img_rotated, sigma, multiplier=20.3):
    """Reference get_standard_deviation_of_summed_textline_patch_along_width
    (main.py:1545-1599), transcribed."""
    y = img_rotated.sum(axis=1).astype(np.float64)
    y_help = np.zeros(len(y) + 20)
    y_help[10:len(y) + 10] = y
    zneg_rev = -y_help + np.max(y_help)
    zneg = np.zeros(len(zneg_rev) + 20)
    zneg[10:len(zneg_rev) + 10] = zneg_rev
    z = profiles.gaussian_filter1d_host(y, sigma)
    zneg = profiles.gaussian_filter1d_host(zneg, sigma)
    peaks_neg = profiles.find_peaks_host(zneg, height=0) - 20
    peaks = profiles.find_peaks_host(z, height=0)
    interest_pos = z[peaks]
    interest_pos = interest_pos[interest_pos > 10]
    interest_neg = z[peaks_neg]  # numpy wrap on negatives; IndexError on >= len
    min_peaks_pos = np.mean(interest_pos)
    grenze = min_peaks_pos - (min_peaks_pos - 0) / multiplier
    interest_neg_fin = interest_neg[interest_neg < grenze]
    return interest_neg_fin, np.std(z)


def _oracle_best_angle(crop, angles, sigma=2.0):
    """Reference return_deskew_slope inner loop (main.py:1620-1665) using a
    real rotation per angle."""
    max_xy = max(crop.shape)
    S = int(max_xy * 1.4)
    canvas = np.zeros((S, S))
    cp = S // 2
    y0 = cp - crop.shape[0] // 2
    x0 = cp - crop.shape[1] // 2
    canvas[y0:y0 + crop.shape[0], x0:x0 + crop.shape[1]] = crop
    var_res = []
    kept = []
    for rot in angles:
        img_rot = rotate.rotate_image_host(canvas, rot, order=3)
        img_rot = (np.abs(img_rot) > 1e-3).astype(np.float64)
        try:
            negs, var = _oracle_score(img_rot, sigma)
            res_me = np.mean(negs)
        except Exception:
            res_me, var = 1e21, 0.0
        if res_me != res_me:  # NaN -> excluded
            continue
        var_res.append(var)
        kept.append(rot)
    if not var_res:
        return 0.0
    return angles[int(np.argmax(var_res))]


@pytest.mark.parametrize("true_angle", [0.0, 6.0, -11.0])
def test_engine_recovers_known_rotation(true_angle):
    mask = _text_mask()
    rot = rotate.rotate_image_host(mask.astype(np.float64), true_angle, order=3)
    crop = (np.abs(rot) > 1e-3).astype(np.uint8)
    engine = deskew.DeskewEngine(DeskewConfig())
    ang = engine.best_angle(crop)
    # engine angle undoes the applied rotation; sweep step is 50/79 ~ 0.633 deg
    assert abs(ang + true_angle) < 1.5


def test_engine_matches_rotation_oracle_argmax():
    mask = _text_mask()
    rot = rotate.rotate_image_host(mask.astype(np.float64), 8.0, order=3)
    crop = (np.abs(rot) > 1e-3).astype(np.uint8)
    angles = np.linspace(-25, 25, 80)
    oracle_ang = _oracle_best_angle(crop, angles)
    engine = deskew.DeskewEngine(DeskewConfig())
    ang = engine.best_angle(crop)
    assert abs(ang - oracle_ang) < 1.5


def test_empty_crop_returns_zero():
    engine = deskew.DeskewEngine(DeskewConfig())
    assert engine.best_angle(np.zeros((50, 80), np.uint8)) == 0.0


def test_vertical_sweep_recovers_steep_rotation():
    """The vertical grid [-90, -50] (main.py:1670) must localize text that
    needs a ~-70 degree correction."""
    mask = _text_mask(h=220, w=300, n_lines=6, line_h=8)
    rot = rotate.rotate_image_host(mask.astype(np.float64), 70.0, order=3)
    crop = (np.abs(rot) > 1e-3).astype(np.uint8)
    engine = deskew.DeskewEngine(DeskewConfig())
    canvas, s = engine._canvas(crop)
    ang = engine._sweep(canvas, s, engine._vertical)
    assert abs(ang + 70.0) < 2.0


@pytest.mark.parametrize("true_angle", [18.0, -21.0, 24.0])
def test_guard_recovers_steep_horizontal_skew(true_angle):
    """DEVIATIONS #15, real sweeps: horizontal text at 15-25 degrees of
    skew keeps its correct coarse angle (the reference-faithful path
    returns a [-90,-50] angle for every one of these — measured -50.0
    across the bench's 18-24 degree pages)."""
    mask = _text_mask()
    rot = rotate.rotate_image_host(mask.astype(np.float64), true_angle,
                                   order=3)
    crop = (np.abs(rot) > 1e-3).astype(np.uint8)
    ang = deskew.DeskewEngine(DeskewConfig()).best_angle(crop)
    assert abs(ang + true_angle) < 1.5
    ref = deskew.DeskewEngine(
        DeskewConfig(vertical_resweep_guard=False)).best_angle(crop)
    assert -90.0 <= ref <= -50.0  # the quirk the guard deviates from


def test_guard_still_accepts_true_vertical_text():
    """DEVIATIONS #15: real vertical text must win the score comparison
    and get a vertical-range angle — INDEPENDENT of where its flat coarse
    profile argmaxes (the reference only consults the vertical sweep when
    |coarse| > 15, which wide vertical regions often fail)."""
    mask = _text_mask(h=220, w=300, n_lines=6, line_h=8)
    rot = rotate.rotate_image_host(mask.astype(np.float64), 70.0, order=3)
    crop = (np.abs(rot) > 1e-3).astype(np.uint8)
    ang = deskew.DeskewEngine(DeskewConfig()).best_angle(crop)
    assert -90.0 <= ang <= -50.0
    assert abs(ang + 70.0) < 2.0


def test_guard_picks_vertical_for_wide_vertical_text_block():
    """The bench-vertical-page failure mode (vert_probe 2026-08-19): a
    WIDE vertical-text region (many tall strokes) has a flat coarse
    profile whose argmax lands near 0 — below the reference's trigger —
    so the reference emits 1 line for an 8-11-line region. The score
    comparison must route it to the vertical range anyway."""
    # 10 tall narrow strokes advancing in x == a wide vertical paragraph
    img = np.zeros((260, 300), np.uint8)
    for li in range(10):
        img[20:240, 20 + li * 26:28 + li * 26] = 1
    ang = deskew.DeskewEngine(DeskewConfig()).best_angle(img)
    assert -90.0 <= ang <= -50.0


def test_coarse_angle_above_threshold_triggers_vertical_sweep(monkeypatch):
    """best_angles re-sweeps [-90,-50] for regions whose coarse result
    exceeds the trigger (main.py:1669) and keeps the rest. With the
    reference-faithful guard OFF, the vertical result replaces the coarse
    one unconditionally even when it scores worse."""
    engine = deskew.DeskewEngine(DeskewConfig(vertical_resweep_guard=False))
    calls = []

    def fake_sweep(canvases, s, angles):
        calls.append((canvases.shape[0], angles))
        if angles is engine._coarse:
            return ([(20.0, 9.0), (3.0, 5.0), (-17.0, 8.0)]
                    + [(0.0, float("-inf"))] * (canvases.shape[0] - 3))
        return [(-70.0, 1.0)] * canvases.shape[0]

    monkeypatch.setattr(engine, "_sweep_batched", fake_sweep)
    m = _text_mask()
    out = engine.best_angles([m, m, m])
    assert out == [-70.0, 3.0, -70.0]
    # one coarse sweep, one vertical sweep (region counts pad to 8)
    assert len(calls) == 2
    assert calls[0][1] is engine._coarse
    assert calls[1][1] is engine._vertical


def test_vertical_resweep_guard_keeps_outscoring_coarse_angle(monkeypatch):
    """DEVIATIONS #15: with the guard (default), a steep coarse angle is
    kept when the vertical re-sweep scores worse (18-degree horizontal
    text), and replaced when the vertical sweep scores better (true
    vertical text)."""
    engine = deskew.DeskewEngine(DeskewConfig())

    def fake_sweep(canvases, s, angles):
        if angles is engine._coarse:
            return ([(18.0, 9.0), (20.0, 2.0)]
                    + [(0.0, float("-inf"))] * (canvases.shape[0] - 2))
        return [(-70.0, 6.0)] * canvases.shape[0]

    monkeypatch.setattr(engine, "_sweep_batched", fake_sweep)
    m = _text_mask()
    # region 0: coarse 18 deg scores 9.0 > vertical 6.0 -> kept;
    # region 1: coarse 20 deg scores 2.0 < vertical 6.0 -> replaced.
    assert engine.best_angles([m, m]) == [18.0, -70.0]


def test_coarse_angle_below_threshold_skips_vertical_sweep(monkeypatch):
    """Reference-faithful mode: no vertical sweep at all below the
    trigger (the guard mode always runs both and compares scores)."""
    engine = deskew.DeskewEngine(
        DeskewConfig(vertical_resweep_guard=False))
    calls = []

    def fake_sweep(canvases, s, angles):
        calls.append(angles)
        return [(3.0, 1.0)] * canvases.shape[0]

    monkeypatch.setattr(engine, "_sweep_batched", fake_sweep)
    assert engine.best_angle(_text_mask()) == 3.0
    assert all(a is engine._coarse for a in calls)

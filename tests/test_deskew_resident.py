"""Device-resident deskew + line-profile path (pipeline/deskew.py resident
section): parity against the host path that it replaces.

The resident program reproduces the host chain exactly up to the line
profile's interpolation model (DEVIATIONS #10): crop gather, erode x2,
canvas render, radon sweep, slope decision, and OPEN+CLOSE are exact; the
deskewed projection profile is an exact hat-kernel projection instead of
bicubic-warp + threshold + sum. At slope exactly 0 the projection equals
plain row/column sums, so the whole chain is bit-identical.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sbb_textline_detection_tpu.core.config import (
    DEFAULT_CONFIG, DeskewConfig, PipelineConfig)
from sbb_textline_detection_tpu.ops import morphology
from sbb_textline_detection_tpu.ops import rotate as rotate_ops
from sbb_textline_detection_tpu.pipeline import deskew as deskew_mod
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.pipeline.deskew import DeskewEngine


def _stripe_mask(h=360, w=480, boxes=None, skew_px=0):
    """Page-like textline label mask with horizontal stripes inside region
    boxes; skew_px shears the stripes across the region width."""
    mask = np.zeros((h, w), np.uint8)
    boxes = boxes or [[30, 40, 180, 120], [240, 60, 200, 160]]
    for x, y, bw, bh in boxes:
        for sy in range(y + 10, y + bh - 10, 24):
            for cx in range(x + 8, x + bw - 8):
                off = int(skew_px * (cx - x) / max(1, bw))
                yy = sy + off
                if yy + 6 < h:
                    mask[yy:yy + 6, cx] = 1
    return mask, boxes


def _host_reference(mask, boxes, cfg: PipelineConfig, engine: DeskewEngine):
    """The host path's (slopes, profiles): eroded crops -> best_angles ->
    reject -> per-region morph + rotate + sum (what the resident program
    must reproduce)."""
    crops = []
    for x, y, w, h in boxes:
        crop = mask[y:y + h, x:x + w]
        crops.append(morphology.erode_host(
            crop, cfg.morphology.kernel_size,
            cfg.morphology.deskew_crop_erode_iterations))
    raw = engine.best_angles(crops)
    slopes = []
    profs = []
    for crop, slope in zip(crops, raw):
        if slope == cfg.deskew.slope_sentinel or \
                abs(slope) > cfg.deskew.slope_reject_abs:
            slope = 0.0
        slopes.append(slope)
        m = (crop.astype(np.uint8) * np.uint8(255))
        k = cfg.morphology.kernel_size
        m = morphology.morph_seq_host(m, (("open", k, 1), ("close", k, 1)))
        dst = rotate_ops.rotate_mask_host(m, slope)
        profs.append((dst.sum(axis=1).astype(np.float64),
                      dst.sum(axis=0).astype(np.float64)))
    return slopes, profs


def _small_cfg(**deskew_kw):
    return dataclasses.replace(
        DEFAULT_CONFIG,
        deskew=DeskewConfig(**deskew_kw) if deskew_kw else DeskewConfig())


def _engine(cfg, region_batch=4, canvas=256):
    return DeskewEngine(
        cfg.deskew, max_canvas=canvas, region_batch=region_batch,
        morph_kernel=cfg.morphology.kernel_size,
        crop_erode_iterations=cfg.morphology.deskew_crop_erode_iterations,
        buf_max=1024)


def test_canvas_index_maps_match_canvas_into():
    """The resident render's per-axis index maps replicate _canvas_into
    (binarize, 1.4x-pad downscale, centered placement) pixel for pixel."""
    rng = np.random.default_rng(0)
    eng = _engine(_small_cfg())
    for trial in range(12):
        h = int(rng.integers(5, 400))
        w = int(rng.integers(5, 400))
        s = 256
        crop = (rng.uniform(size=(h, w)) < 0.3).astype(np.uint8)
        want = np.zeros((s, s), np.uint8)
        eng._canvas_into(crop, want)
        cy, cx = deskew_mod._canvas_index_maps(h, w, s, eng.cfg.pad_factor)
        got = np.zeros((s, s), np.uint8)
        oky = cy >= 0
        okx = cx >= 0
        got[np.ix_(oky, okx)] = crop[np.ix_(cy[oky], cx[okx])] != 0
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_hat_projection_angle_zero_is_exact_sums():
    rng = np.random.default_rng(1)
    m = (rng.uniform(size=(90, 130)) < 0.2).astype(np.float32)
    buf = np.zeros((256, 256), np.float32)
    buf[:90, :130] = m
    p1 = np.asarray(deskew_mod._hat_projection_rows(
        jnp.asarray(buf), 90, 130, jnp.float32(0.0), 256, 256))
    np.testing.assert_array_equal(p1[:90], m.sum(axis=1))
    assert p1[90:].sum() == 0.0
    p0 = np.asarray(deskew_mod._hat_projection_rows(
        jnp.asarray(buf).T, 130, 90, jnp.float32(-0.0), 256, 256))
    np.testing.assert_array_equal(p0[:130], m.sum(axis=0))


def test_hat_projection_tracks_rotated_sums():
    """At a real angle the projection must conserve mass and put its peaks
    where the rotated-mask row sums put theirs."""
    mask = np.zeros((200, 240), np.uint8)
    for sy in range(30, 170, 30):
        mask[sy:sy + 8, 20:220] = 1
    ang = 4.0
    buf = np.zeros((256, 256), np.float32)
    buf[:200, :240] = mask
    p = np.asarray(deskew_mod._hat_projection_rows(
        jnp.asarray(buf), 200, 240, jnp.float32(ang), 256, 256))[:200]
    dst = rotate_ops.rotate_mask_host(mask * np.uint8(255), ang)
    want = dst.sum(axis=1)
    assert abs(p.sum() - mask.sum()) / mask.sum() < 1e-4  # mass conserved
    from sbb_textline_detection_tpu.ops import profiles as prof_ops
    ps = prof_ops.find_peaks_host(
        prof_ops.gaussian_filter1d_host(p.astype(np.float64), 4), height=1)
    ws = prof_ops.find_peaks_host(
        prof_ops.gaussian_filter1d_host(want.astype(np.float64), 4),
        height=1)
    assert len(ps) == len(ws) == 5
    assert np.abs(np.asarray(ps) - np.asarray(ws)).max() <= 2


def test_resident_slopes_match_host_path():
    cfg = _small_cfg()
    eng = _engine(cfg)
    for skew in (0, 14):
        mask, boxes = _stripe_mask(skew_px=skew)
        want, _ = _host_reference(mask, boxes, cfg, eng)
        got, _ = eng.slopes_and_profiles_resident(jnp.asarray(mask), boxes)
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"skew={skew}")


def test_resident_profiles_close_to_host():
    """Profiles: exact when the decided slope is 0; at nonzero slopes the
    interpolation models differ (DEVIATIONS #10) but peak structure must
    match."""
    cfg = _small_cfg(coarse_range=(-2.0, 2.0), coarse_steps=5)  # incl. 0.0
    eng = _engine(cfg)
    mask, boxes = _stripe_mask(skew_px=0)
    slopes_h, profs_h = _host_reference(mask, boxes, cfg, eng)
    slopes_d, profs_d = eng.slopes_and_profiles_resident(
        jnp.asarray(mask), boxes)
    np.testing.assert_allclose(slopes_d, slopes_h, atol=1e-6)
    for (p1d, p0d), (p1h, p0h), s in zip(profs_d, profs_h, slopes_d):
        assert s == 0.0  # unskewed stripes + angle grid containing 0
        np.testing.assert_array_equal(p1d, p1h)
        np.testing.assert_array_equal(p0d, p0h)


def test_slopes_and_lines_resident_matches_host_unskewed():
    """End-to-end slopes_and_lines: with a 0-containing angle grid and
    unskewed stripes, the resident path must produce bit-identical line
    boxes to the host path."""
    cfg = _small_cfg(coarse_range=(-2.0, 2.0), coarse_steps=5)
    eng = _engine(cfg)
    mask, boxes = _stripe_mask(skew_px=0)
    contours = [np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
                for x, y, w, h in boxes]
    s_host, l_host = stages.slopes_and_lines(contours, boxes, mask, cfg, eng)
    s_res, l_res = stages.slopes_and_lines(contours, boxes, mask, cfg, eng,
                                           textline_dev=jnp.asarray(mask))
    assert s_res == s_host
    assert [len(l) for l in l_res] == [len(l) for l in l_host]
    for la, lb in zip(l_res, l_host):
        for ba, bb in zip(la, lb):
            np.testing.assert_array_equal(ba, bb)


def test_slopes_and_lines_resident_skewed_close():
    cfg = _small_cfg(coarse_steps=40)
    eng = _engine(cfg)
    mask, boxes = _stripe_mask(h=420, w=520,
                               boxes=[[40, 40, 420, 330]], skew_px=28)
    contours = [np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
                for x, y, w, h in boxes]
    s_host, l_host = stages.slopes_and_lines(contours, boxes, mask, cfg, eng)
    s_res, l_res = stages.slopes_and_lines(contours, boxes, mask, cfg, eng,
                                           textline_dev=jnp.asarray(mask))
    np.testing.assert_allclose(s_res, s_host, atol=1e-5)
    assert [len(l) for l in l_res] == [len(l) for l in l_host]
    for la, lb in zip(l_res, l_host):
        for ba, bb in zip(la, lb):
            assert np.abs(ba - bb).max() <= 3, (ba, bb)


def test_resident_rejects_oversized_region():
    cfg = _small_cfg()
    eng = _engine(cfg)
    eng.buf_max = 256
    mask = np.zeros((300, 300), np.uint8)
    with pytest.raises(ValueError, match="exceeds"):
        eng.slopes_and_profiles_resident(
            jnp.asarray(mask), [[0, 0, 300, 300]])


def test_resident_empty_and_padded_slots():
    cfg = _small_cfg()
    eng = _engine(cfg, region_batch=4)
    mask, boxes = _stripe_mask()
    # 5 regions -> two groups (4 + 1 padded); empty region among them
    boxes5 = boxes + [[5, 5, 10, 10], [200, 300, 40, 30], [0, 0, 8, 8]]
    slopes, profs = eng.slopes_and_profiles_resident(
        jnp.asarray(mask), boxes5)
    assert len(slopes) == len(profs) == 5
    for (p1, p0), (x, y, w, h) in zip(profs, boxes5):
        assert p1.shape == (h,) and p0.shape == (w,)

"""Speculative resident deskew (pipeline/deskew.py spec section): the
deskew program dispatched from DEVICE region boxes (CC top-k over the
packed region canvas) before the blob fetch must be BIT-EXACT with the
ordinary resident dispatch wherever the host boxes match the device
boxes, and fall back to it (same values) everywhere else.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import (
    DEFAULT_CONFIG, DeskewConfig, PipelineConfig, RuntimeConfig)
from sbb_textline_detection_tpu.ops import pack as pack_ops
from sbb_textline_detection_tpu.pipeline import deskew as deskew_mod
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.pipeline.deskew import DeskewEngine


def _cfg(**deskew_kw):
    return dataclasses.replace(
        DEFAULT_CONFIG,
        deskew=DeskewConfig(**deskew_kw) if deskew_kw else DeskewConfig())


def _engine(cfg, region_batch=4, canvas=256):
    return DeskewEngine(
        cfg.deskew, max_canvas=canvas, region_batch=region_batch,
        morph_kernel=cfg.morphology.kernel_size,
        crop_erode_iterations=cfg.morphology.deskew_crop_erode_iterations,
        buf_max=1024)


def _page(h=360, w=480, boxes=None, skew_px=6):
    """(region_canvas, textline_canvas, boxes): filled region rectangles
    whose traced contours ARE the boxes, with striped textlines inside."""
    boxes = boxes or [[30, 40, 180, 120], [240, 60, 200, 160]]
    region = np.zeros((h, w), np.uint8)
    textline = np.zeros((h, w), np.uint8)
    for x, y, bw, bh in boxes:
        region[y:y + bh, x:x + bw] = 1
        for sy in range(y + 10, y + bh - 10, 24):
            for cx in range(x + 8, x + bw - 8):
                yy = sy + int(skew_px * (cx - x) / max(1, bw))
                if yy + 6 < h:
                    textline[yy:yy + 6, cx] = 1
    return region, textline, boxes


def _spec_run(eng, region, textline, boxes, cfg, crop_hw=None,
              slots=8):
    """Dispatch + finalize the speculative path exactly as the detector
    does: packed blob (region bytes first, arbitrary tail), full-canvas
    crop, permissive pixel-count area bounds."""
    H, W = region.shape
    crop_hw = crop_hw or (H, W)
    packed = pack_ops.pack1_host(region)
    blob = np.concatenate([packed, np.zeros(8, np.uint8)])  # proj-ish tail
    area = float(crop_hw[0] * crop_hw[1])
    amin = 0.5 * cfg.region.min_area_ratio * area
    pending = eng.spec_dispatch(
        jnp.asarray(blob), len(packed), (H, W), jnp.asarray(textline),
        crop_hw, amin, area, slots=slots)
    return eng.spec_finalize(pending, boxes)


def test_spec_matches_resident_bit_exact():
    """Full match: every host contour box finds its device slot and the
    (slopes, profiles) equal the ordinary resident path's bit for bit."""
    cfg = _cfg()
    eng = _engine(cfg)
    region, textline, boxes = _page()
    want_s, want_p = eng.slopes_and_profiles_resident(
        jnp.asarray(textline), boxes)
    resolved = _spec_run(eng, region, textline, boxes, cfg)
    assert isinstance(resolved, deskew_mod._SpecResolved)
    assert resolved.fallback is None, "all regions must match their slots"
    assert all(m >= 0 for m in resolved.mapping)
    got_s, got_p = eng.resident_collect(resolved)
    assert got_s == want_s
    for (g1, g0), (w1, w0) in zip(got_p, want_p):
        np.testing.assert_array_equal(g1, w1)
        np.testing.assert_array_equal(g0, w0)


def test_spec_mismatched_box_falls_back_per_region():
    """A host box absent from the device set (here: the contour of a
    region whose component was NOT in the mask the speculative program
    saw) is served by the fallback dispatch; results still equal the
    ordinary path for every region."""
    cfg = _cfg()
    eng = _engine(cfg)
    region, textline, boxes = _page()
    # host sees one extra region the device mask lacks
    boxes_host = boxes + [[300, 10, 60, 30]]
    want = eng.slopes_and_profiles_resident(jnp.asarray(textline),
                                            boxes_host)
    resolved = _spec_run(eng, region, textline, boxes_host, cfg)
    assert resolved.mapping.count(-1) == 1
    assert resolved.fallback is not None
    got = eng.resident_collect(resolved)
    assert got[0] == want[0]
    for (g1, g0), (w1, w0) in zip(got[1], want[1]):
        np.testing.assert_array_equal(g1, w1)
        np.testing.assert_array_equal(g0, w0)


def test_spec_bucket_mismatch_full_fallback():
    """Tiny regions pick a smaller canvas bucket than the speculative
    program's static one — scores are canvas-dependent, so the WHOLE page
    must fall back (spec_finalize returns an ordinary pending)."""
    cfg = _cfg()
    eng = _engine(cfg, canvas=512)
    assert eng.spec_canvas() == 512
    boxes = [[30, 40, 80, 60], [150, 60, 90, 70]]  # max dim*1.4 < 256
    region, textline, _ = _page(boxes=boxes)
    assert eng._bucket_for_sizes([(b[3], b[2]) for b in boxes]) == 256
    want = eng.slopes_and_profiles_resident(jnp.asarray(textline), boxes)
    resolved = _spec_run(eng, region, textline, boxes, cfg)
    assert not isinstance(resolved, deskew_mod._SpecResolved)
    got = eng.resident_collect(resolved)
    assert got[0] == want[0]


def test_spec_oversized_region_raises_like_resident():
    cfg = _cfg()
    eng = _engine(cfg)
    eng.buf_max = 256
    region, textline, _ = _page()
    boxes = [[0, 0, 300, 300]]
    pend = deskew_mod._SpecPending(None, 0.0, eng.spec_canvas(), 256, 256,
                                   8, jnp.asarray(textline))
    with pytest.raises(ValueError, match="exceeds"):
        eng.spec_finalize(pend, boxes)


def test_spec_crop_mask_excludes_outside_components():
    """Foreground OUTSIDE the page crop (white-tile predictions the host
    never sees) must not shift or merge device boxes: the in-graph crop
    mask removes it."""
    cfg = _cfg()
    eng = _engine(cfg)
    region, textline, boxes = _page()
    crop_h, crop_w = 300, 460
    region2 = region.copy()
    region2[crop_h:, :] = 1          # phantom rows beyond the crop
    region2[:, crop_w:] = 1
    region2[:crop_h, :crop_w] = region[:crop_h, :crop_w]
    boxes_in = [b for b in boxes
                if b[0] + b[2] <= crop_w and b[1] + b[3] <= crop_h]
    assert boxes_in, "fixture must keep at least one in-crop region"
    want = eng.slopes_and_profiles_resident(jnp.asarray(textline), boxes_in)
    resolved = _spec_run(eng, region2, textline, boxes_in, cfg,
                         crop_hw=(crop_h, crop_w))
    assert resolved.fallback is None
    got = eng.resident_collect(resolved)
    assert got[0] == want[0]


@pytest.mark.parametrize("seed", range(4))
def test_canvas_maps_graph_matches_host(seed):
    """The in-graph canvas maps (traced h, w) == the host maps, including
    downscaled crops, plus the numpy twin used by spec_finalize's match
    rule."""
    rng = np.random.default_rng(50 + seed)
    s = 256
    pad = 1.4
    table = (np.arange(1501, dtype=np.float64) * pad).astype(np.int32)
    fn = jax.jit(lambda h, w: deskew_mod._canvas_maps_graph(
        h, w, s, jnp.asarray(table)))
    for _ in range(12):
        h = int(rng.integers(4, 1400))
        w = int(rng.integers(4, 1400))
        cy_h, cx_h = deskew_mod._canvas_index_maps(h, w, s, pad)
        cy_t, cx_t = deskew_mod._canvas_maps_graph_host(h, w, s, pad)
        cy_g, cx_g = fn(jnp.int32(h), jnp.int32(w))
        np.testing.assert_array_equal(np.asarray(cy_g), cy_t)
        np.testing.assert_array_equal(np.asarray(cx_g), cx_t)
        # the host-vs-twin comparison is exactly spec_finalize's match
        # rule: where they are equal, the graph render == the host render
        if np.array_equal(cy_t, cy_h) and np.array_equal(cx_t, cx_h):
            continue
        # a mismatch is allowed only on the documented downscale edge
        assert int(max(h, w) * pad) > s


def test_canvas_maps_twin_equals_host_on_production_grid():
    """Dense sweep of the no-downscale regime (crops that fit the canvas)
    plus a structured downscale grid: the twin should equal the host maps
    everywhere here — a disagreement would silently route regions to the
    fallback (correct but slow), so we pin the expected coverage."""
    pad = 1.4
    mismatches = 0
    for s in (256, 512):
        lim = int(s / pad)
        for h in range(4, lim, 7):
            for w in (4, lim // 2, lim - 1):
                a = deskew_mod._canvas_index_maps(h, w, s, pad)
                b = deskew_mod._canvas_maps_graph_host(h, w, s, pad)
                assert np.array_equal(a[0], b[0])
                assert np.array_equal(a[1], b[1])
        for h in range(lim, 4 * s, 13):     # downscale regime
            w = max(4, h // 2)
            a = deskew_mod._canvas_index_maps(h, w, s, pad)
            b = deskew_mod._canvas_maps_graph_host(h, w, s, pad)
            if not (np.array_equal(a[0], b[0])
                    and np.array_equal(a[1], b[1])):
                mismatches += 1
    assert mismatches == 0, (
        f"{mismatches} float-vs-integer map edges found; spec coverage "
        "would silently shrink — investigate before relying on spec wins")


def test_detector_spec_on_off_identical():
    """process_image through the raw path with speculation on vs off must
    be byte-identical (XML and slopes)."""
    import re
    import xml.etree.ElementTree as ET

    from sbb_textline_detection_tpu.models import registry, runner
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

    DUAL_TINY = registry.ModelSpec("tiny_dual", "tpu_unet", 64, 64, 5,
                                   widths=(8, 16), heads=(3, 2),
                                   in_channels=2)
    PAGE_TINY = registry.ModelSpec("tiny_page", "tpu_unet", 64, 64, 2,
                                   widths=(8, 16))
    rt = RuntimeConfig(batch_buckets=(2, 4, 8))
    page_m = runner.SegmentationModel(
        PAGE_TINY, registry.init_variables(PAGE_TINY, seed=0), rt)
    dual_m = runner.SegmentationModel(
        DUAL_TINY, registry.init_variables(DUAL_TINY, seed=1), rt)
    bundle = runner.ModelBundle(page_m, dual_m, dual_m)

    img = np.full((300, 240, 3), 235, np.uint8)
    for y in range(40, 260, 24):
        img[y:y + 10, 30:210] = 25

    def run(spec):
        from sbb_textline_detection_tpu.core.config import ResizePolicy
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            resize=ResizePolicy(300, 160, 1.0),
            deskew=DeskewConfig(coarse_steps=6, vertical_steps=4),
            runtime=dataclasses.replace(
                DEFAULT_CONFIG.runtime, batch_buckets=(2, 4, 8),
                deskew_canvas=256, spec_deskew=spec, deskew_spec_slots=8))
        det = TextlineDetector(bundle, cfg)
        return det.process_image(img, "p.png")

    a = run(False)
    b = run(True)
    assert a.slopes == b.slopes
    assert a.page_coord == b.page_coord
    strip = lambda s: re.sub(rb"<Metadata>.*?</Metadata>", b"", s,
                             flags=re.S)
    assert strip(ET.tostring(a.xml_tree.getroot())) == \
        strip(ET.tostring(b.xml_tree.getroot()))

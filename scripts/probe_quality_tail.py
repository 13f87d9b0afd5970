"""Model-free probe of the heuristic quality tail (VERDICT r4 #5): feed
slopes_and_lines PERFECT segmentation masks of a rotated paragraph and
measure recovered slope + line count against ground truth — any residual
error here is the deskew sweep or the projection-profile splitter, not
the models. Also produces the canvas 512-vs-1024 angle-error table
(finishing VERDICT r3 #8 at the engine level).

CPU-runnable (deterministic, no checkpoints):
  JAX_PLATFORMS=cpu python scripts/probe_quality_tail.py
"""
import dataclasses
import os
import sys

import numpy as np
from PIL import Image

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.pipeline.deskew import DeskewEngine


def rotated_region(skew_deg, n_lines=12, line_h=26, gap=34, w=1100,
                   margin=60):
    """(region_mask, textline_mask) at working-ish resolution: an upright
    n_lines paragraph rotated by skew_deg (PIL, expand) inside a page
    canvas — textlines as stripes, region as the filled block."""
    ph = 2 * margin + n_lines * (line_h + gap) - gap
    pw = 2 * margin + w
    text = np.zeros((ph, pw), np.uint8)
    block = np.zeros((ph, pw), np.uint8)
    for i in range(n_lines):
        y = margin + i * (line_h + gap)
        text[y:y + line_h, margin:margin + w] = 255
    block[margin - 10:ph - margin + 10,
          margin - 10:pw - margin + 10] = 255
    rot = lambda a: np.asarray(
        Image.fromarray(a).rotate(skew_deg, expand=True, fillcolor=0))
    tr, br = rot(text), rot(block)
    pad = 40
    tr = np.pad(tr, pad)
    br = np.pad(br, pad)
    return (br > 127).astype(np.uint8), (tr > 127).astype(np.uint8)


def engine_for(cfg, canvas):
    return DeskewEngine(
        cfg.deskew, max_canvas=canvas,
        region_batch=cfg.runtime.deskew_batch,
        morph_kernel=cfg.morphology.kernel_size,
        crop_erode_iterations=cfg.morphology.deskew_crop_erode_iterations,
        buf_max=cfg.runtime.deskew_buf_max)


def probe(skew, canvas, n_lines=12, vertical=False):
    cfg = DEFAULT_CONFIG
    region, textline = rotated_region(skew, n_lines=n_lines)
    if vertical:
        region, textline = region.T.copy(), textline.T.copy()
    eng = engine_for(cfg, canvas)
    contours, boxes = stages.region_contours_and_boxes(region, cfg)
    assert len(boxes) == 1, f"expected 1 region, got {len(boxes)}"
    slopes, lines = stages.slopes_and_lines(contours, boxes, textline,
                                            cfg, eng)
    return slopes[0], len(lines[0])


def main():
    print("== horizontal text, perfect masks: slope + line count vs truth",
          flush=True)
    print(f"{'skew':>6} | {'canvas':>6} | {'slope':>8} | {'err':>6} | "
          f"{'lines':>5} (truth 12)", flush=True)
    for skew in (2.5, 6.0, 10.0, 15.0, 18.0, 21.0, 24.0, -18.0, -24.0):
        for canvas in (512, 1024):
            slope, nl = probe(skew, canvas)
            # PIL rotate(a) turns the page CCW; the correction the sweep
            # reports is -a (see tests/test_detector_e2e)
            err = abs(slope - (-skew))
            print(f"{skew:6.1f} | {canvas:6d} | {slope:8.2f} | {err:6.2f} "
                  f"| {nl:5d}", flush=True)
    print("== vertical text (12 columns), perfect masks", flush=True)
    for skew in (0.0, 2.5, 6.0):
        for canvas in (512, 1024):
            slope, nl = probe(skew, canvas, vertical=True)
            print(f"{skew:6.1f} | {canvas:6d} | {slope:8.2f} | "
                  f"{nl:5d} cols (truth 12)", flush=True)


if __name__ == "__main__":
    main()

"""Deskew-canvas fidelity A/B (VERDICT r3 #8): runtime.deskew_canvas 512
vs 1024 on HIGH-SKEW pages (the reference sweep range tops out at +-25
deg, main.py:1620 — the regime where downscaling a full-size region into
the 512 sweep canvas costs the most angular resolution).

Quality is deterministic per config, so one pass per arm suffices for the
angle-error / line-recall table; wall time is recorded per-arm for the
speed cost of the 1024 canvas (same process, interleaved, so tunnel drift
hits both arms). Output: per-page recovered-slope vs ground-truth table +
mean |angle error| + line recall per arm.
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import ensure_bench_checkpoints, _CKPT_CACHE
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector
from sbb_textline_detection_tpu.training import eval as eval_mod
from sbb_textline_detection_tpu.utils import synthetic

CK = os.environ.get("SBB_AB_CKPTS", _CKPT_CACHE)
ensure_bench_checkpoints(CK, int(os.environ.get("SBB_AB_STEPS", "150")))
models = ModelBundle.from_dir(CK, DEFAULT_CONFIG.runtime,
                              DEFAULT_CONFIG.model_names)

SKEWS = [15.0, -15.0, 18.0, -18.0, 21.0, -21.0, 24.0, -24.0]
rng = np.random.default_rng(11)
pages = [synthetic.make_page(rng, 3508, 2480, skew_deg=s,
                             degrade=(0.6 if i % 3 == 0 else 0.0))
         for i, s in enumerate(SKEWS)]


def run(canvas: int):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, runtime=dataclasses.replace(
            DEFAULT_CONFIG.runtime, deskew_canvas=canvas))
    det = TextlineDetector(models, cfg)
    det.warm_up(3508, 2480)
    t0 = time.time()
    results = list(det.process_batch(
        (p, f"c{canvas}_{i}.png") for i, (p, _) in enumerate(pages)))
    dt = time.time() - t0
    rows = []
    for (p, layout), res in zip(pages, results):
        score = eval_mod.evaluate_layout(res, layout)
        slopes = [s for s in res.slopes if abs(s) < 900]  # drop sentinels
        med = float(np.median(slopes)) if slopes else float("nan")
        rows.append((layout.skew_deg, med, score.line_recall,
                     len(res.contours)))
    return dt, rows


for canvas in (512, 1024):
    dt, rows = run(canvas)
    errs = [abs(abs(med) - abs(sk)) for sk, med, _, _ in rows
            if not np.isnan(med)]
    recalls = [r for _, _, r, _ in rows]
    print(f"[ab] canvas={canvas}: {dt:.1f}s, "
          f"mean|angle err|={np.mean(errs):.3f} deg, "
          f"max={np.max(errs):.3f}, "
          f"line_recall={np.nanmean(recalls):.3f}", flush=True)
    for sk, med, rec, nreg in rows:
        print(f"    skew {sk:+6.1f}  median slope {med:+7.2f}  "
              f"line_recall {rec:.3f}  regions {nreg}", flush=True)

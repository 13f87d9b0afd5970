"""Paired per-page quality probe across bench-checkpoint versions.

Quality is deterministic per checkpoint (tunnel health only affects wall
time), so one pass per arm suffices. Prints per page: region
precision/recall, line recall, line-count MAE, and the scan-frame bbox +
area of every false-positive region, so training-task iterations can be
judged on WHICH pages and WHAT kind of FP they move (PERF.md
figure-precision ladder).

Usage: python scripts/quality_probe.py v5 v8   (ckpt cache suffixes)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import ensure_bench_checkpoints
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector
from sbb_textline_detection_tpu.training import eval as eval_mod
from sbb_textline_detection_tpu.utils import synthetic

# the bench hard mix (bench.py), verbatim
HARD_MIX = [
    (0.0,   0.8,   0,   0.0,  False),
    (18.0,  0.0,   2,   0.0,  False),
    (0.0,   0.0,   0,   0.0,  True),
    (-8.0,  0.8,   0,   0.4,  False),
    (0.0,   0.8,   2,   0.35, False),
    (24.0,  0.0,   0,   0.35, False),
    (0.0,   0.0,   3,   0.0,  False),
    (-15.0, 0.0,   0,   0.0,  False),
]


def main() -> None:
    versions = sys.argv[1:] or ["v5", "v8"]
    rng = np.random.default_rng(7)
    pages_layouts = [synthetic.make_page(rng, 3508, 2480, skew_deg=m[0],
                                         degrade=m[1], figures=m[2],
                                         bleed=m[3], vertical=m[4])
                     for m in HARD_MIX]

    for ver in versions:
        ck = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", f"bench_ckpts_{ver}")
        ensure_bench_checkpoints(ck, 300)  # trains missing roles
        models = ModelBundle.from_dir(ck, DEFAULT_CONFIG.runtime,
                                      DEFAULT_CONFIG.model_names)
        det = TextlineDetector(models, DEFAULT_CONFIG)
        t0 = time.time()
        precs, recs, lrecs, maes = [], [], [], []
        for i, res in enumerate(det.process_batch(
                (p, f"{ver}_{i}.png") for i, (p, _) in enumerate(
                    pages_layouts))):
            layout = pages_layouts[i][1]
            s = eval_mod.evaluate_layout(res, layout)
            m = HARD_MIX[i]
            precs.append(s.region_precision)
            recs.append(s.region_recall)
            lrecs.append(s.line_recall)
            maes.append(s.line_count_mae)
            tag = (f"skew{m[0]:+.0f} deg{m[1]:.1f} fig{m[2]} "
                   f"bleed{m[3]:.2f}{' VERT' if m[4] else ''}")
            print(f"[{ver}] page {i} ({tag}): prec {s.region_precision:.3f} "
                  f"rec {s.region_recall:.2f} line_rec {s.line_recall:.3f} "
                  f"line_mae {s.line_count_mae:.2f} "
                  f"({len(res.contours)} regions)", flush=True)
            if s.region_precision < 1.0:
                fps = getattr(s, "false_positive_boxes", None)
                if fps is None:
                    continue
                for (x0, y0, x1, y1) in fps:
                    print(f"    FP box ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})"
                          f" {x1 - x0:.0f}x{y1 - y0:.0f}", flush=True)
        print(f"[{ver}] MEAN prec {np.nanmean(precs):.3f} "
              f"rec {np.nanmean(recs):.3f} line_rec {np.nanmean(lrecs):.3f} "
              f"line_mae {np.nanmean(maes):.3f}  ({time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()

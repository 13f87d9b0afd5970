"""Per-paragraph diagnosis of the high-skew line_count_mae (VERDICT r4
#5): run one bench high-skew page through the v10 checkpoints and break
the error down — recovered slope per region, predicted vs truth line
count per paragraph, and the count of textline-mask stripes INSIDE each
region (separates mask quality from splitter behavior; the model-free
probe scripts/probe_quality_tail.py already cleared the splitter at
these angles with perfect masks).

CPU-runnable: JAX_PLATFORMS=cpu python scripts/probe_skew_page.py [skew]
(first CPU compile of the page-shape programs is minutes, then cached).
"""
import os
import sys

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from bench import ensure_bench_checkpoints, _CKPT_CACHE
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.utils import synthetic

SKEW = float(sys.argv[1]) if len(sys.argv) > 1 else 18.0
CK = os.environ.get("SBB_AB_CKPTS", _CKPT_CACHE)
ensure_bench_checkpoints(CK, 300)
models = ModelBundle.from_dir(CK, DEFAULT_CONFIG.runtime,
                              DEFAULT_CONFIG.model_names)

rng = np.random.default_rng(7)
page, layout = synthetic.make_page(rng, 3508, 2480, skew_deg=SKEW,
                                   figures=2)

from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

det = TextlineDetector(models, DEFAULT_CONFIG)
res = det.process_image(page, "skew.png")
h, w = page.shape[:2]
sx = 1.0 / res.timings.get("__scale_x", 1) if False else None

# map truth paragraphs into the skewed scan frame, then into xml coords
# (PageResult contours are in PAGE-XML scan coords already)
print(f"[probe] skew {SKEW}: {len(res.contours)} regions predicted, "
      f"{len(layout.paragraphs)} truth paragraphs", flush=True)


def quad(b):
    x0, y0, x1, y1 = b
    pts = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)
    return synthetic.rotate_points(pts, h, w, layout.skew_deg)


def centroid(c):
    c = np.asarray(c, np.float64).reshape(-1, 2)
    return c.mean(axis=0)


truth = [(quad(b), n) for b, n in zip(layout.paragraphs, layout.n_lines)]
used = set()
rows = []
for ci, (cont, slope, lines) in enumerate(zip(res.contours, res.slopes,
                                              res.textlines)):
    cen = centroid(cont)
    best, bd = None, 1e18
    for ti, (q, n) in enumerate(truth):
        d = float(np.sum((q.mean(axis=0) - cen) ** 2))
        if d < bd and ti not in used:
            best, bd = ti, d
    if best is not None:
        used.add(best)
    tn = truth[best][1] if best is not None else -1
    rows.append((ci, best, tn, len(lines), slope))
    print(f"[probe] region {ci}: truth_par {best} truth_lines {tn} "
          f"pred_lines {len(lines)} slope {slope:7.2f} "
          f"(want {-layout.skew_deg:.1f})", flush=True)
missing = [i for i in range(len(truth)) if i not in used]
for i in missing:
    print(f"[probe] truth paragraph {i} UNMATCHED ({truth[i][1]} lines)",
          flush=True)
mae = np.mean([abs(tn - pn) for _, _, tn, pn, _ in rows if tn >= 0]
              + [truth[i][1] for i in missing])
print(f"[probe] line_count_mae(ish) {mae:.2f}", flush=True)

"""Per-page event timeline of the raw device phase + host phase, spec on
vs off — the PERF.md evidence that the deskew dispatch no longer waits on
the packed blob fetch (VERDICT r4 #1). Sequential process_image (one page
chain at a time) so the offsets read as THE critical path."""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import ensure_bench_checkpoints, _CKPT_CACHE
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.models import runner as runner_mod
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pipeline import deskew as deskew_mod
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector
from sbb_textline_detection_tpu.utils import synthetic

CK = os.environ.get("SBB_AB_CKPTS", _CKPT_CACHE)
ensure_bench_checkpoints(CK, 300)
models = ModelBundle.from_dir(CK, DEFAULT_CONFIG.runtime,
                              DEFAULT_CONFIG.model_names)

EVENTS = []


def mark(name):
    EVENTS.append((name, time.time()))


def wrap(obj, attr, label):
    fn = getattr(obj, attr)

    def wrapped(*a, **k):
        mark(label + ".in")
        out = fn(*a, **k)
        mark(label + ".out")
        return out
    setattr(obj, attr, wrapped)


wrap(runner_mod.DeferredFusedRaw, "fetch", "blob_fetch")
wrap(deskew_mod.DeskewEngine, "spec_dispatch", "spec_dispatch")
wrap(deskew_mod.DeskewEngine, "spec_finalize", "spec_finalize")
wrap(deskew_mod.DeskewEngine, "resident_dispatch", "resident_dispatch")
wrap(deskew_mod.DeskewEngine, "resident_collect", "resident_collect")
wrap(stages, "region_contours_and_boxes", "contours")

rng = np.random.default_rng(7)
pages = [synthetic.make_page(rng, 3508, 2480, skew_deg=s, degrade=d)[0]
         for s, d in [(0.0, 0.8), (6.0, 0.0), (2.5, 0.0), (0.0, 0.0)]]


def run(spec):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, runtime=dataclasses.replace(
            DEFAULT_CONFIG.runtime, spec_deskew=spec))
    det = TextlineDetector(models, cfg)
    print(f"[tl] warming spec={spec}...", flush=True)
    det.warm_up(3508, 2480)
    det.process_image(pages[0], "warm.png")  # shape warm
    for i, p in enumerate(pages):
        EVENTS.clear()
        t0 = time.time()
        res = det.process_image(p, f"p{i}.png")
        total = time.time() - t0
        line = " ".join(f"{n}@{(t - t0)*1e3:.0f}" for n, t in EVENTS)
        print(f"[tl] spec={int(spec)} page{i} total {total*1e3:.0f}ms "
              f"regions={len(res.contours)} | {line}", flush=True)


run(True)
run(False)

"""Paired interleaved A/B: device-phase workers 2 vs 3 vs 4 in ONE
process, same 8-page batch (the hardened mix shapes), 3 rounds,
min-of-pair per arm per round (CLAUDE.md protocol).

Re-run of the r3 "2 vs 3" decision: that A/B predated the native
host-path kernels (PERF.md host table, ~190 -> ~35 ms/page) — the 3rd
worker lost to host contention that has since been removed."""
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
from sbb_textline_detection_tpu.utils import synthetic

CK = os.environ.get("SBB_AB_CKPTS", _CKPT_CACHE)
ensure_bench_checkpoints(CK, int(os.environ.get("SBB_AB_STEPS", "300")))
models = ModelBundle.from_dir(CK, DEFAULT_CONFIG.runtime,
                              DEFAULT_CONFIG.model_names)


def make_det(workers):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, runtime=dataclasses.replace(
            DEFAULT_CONFIG.runtime, device_phase_workers=workers))
    return TextlineDetector(models, cfg)


dets = {"w2": make_det(2), "w3": make_det(3), "w4": make_det(4)}

rng = np.random.default_rng(7)
skews = [0.0, 18.0, 0.0, -8.0, 0.0, 24.0, 0.0, -15.0]
degs = [0.8, 0.0, 0.0, 0.8, 0.8, 0.0, 0.0, 0.0]
pages = [synthetic.make_page(rng, 3508, 2480, skew_deg=s, degrade=d)[0]
         for s, d in zip(skews, degs)]


def run(det, tag):
    t0 = time.time()
    n = 0
    for res in det.process_batch((p, f"{tag}_{i}.png")
                                 for i, p in enumerate(pages)):
        n += len(res.contours)
    dt = time.time() - t0
    print(f"  {tag}: {dt:6.2f}s ({n} regions)", flush=True)
    return dt


first = next(iter(dets.values()))
print("[ab] warming (shared programs)...", flush=True)
t0 = time.time()
first.warm_up(3508, 2480)
print(f"[ab] warm: {time.time()-t0:.1f}s", flush=True)
for name, det in dets.items():
    run(det, f"warm_{name}")

wins = {k: 0 for k in dets}
for r in range(3):
    print(f"[ab] round {r}:", flush=True)
    mins = {}
    for name, det in dets.items():
        a = run(det, f"{name}a")
        b = run(det, f"{name}b")
        mins[name] = min(a, b)
    best = min(mins, key=mins.get)
    wins[best] += 1
    print(f"[ab] round {r}: " +
          " ".join(f"{k}={v:.2f}" for k, v in mins.items()) +
          f" -> {best}", flush=True)
print(f"[ab] wins: {wins}", flush=True)

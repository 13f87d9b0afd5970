"""Paired interleaved A/B: speculative resident deskew (S) vs the
post-contours dispatch (N) in ONE process, same 8-page batch, 3 rounds,
min-of-pair per arm per round (CLAUDE.md protocol). Round 0 also asserts
output equality between the arms (the spec contract is bit-exactness)."""
import dataclasses
import os
import re
import sys
import time
import xml.etree.ElementTree as ET

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


def make_det(spec):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, runtime=dataclasses.replace(
            DEFAULT_CONFIG.runtime, spec_deskew=spec))
    return TextlineDetector(models, cfg)


dets = {"S": make_det(True), "N": make_det(False)}

rng = np.random.default_rng(7)
skews = [0.0, 6.0, 0.0, 2.5, 0.0, 2.5, 0.0, 6.0]
degs = [0.8, 0.0, 0.0, 0.8, 0.8, 0.0, 0.0, 0.0]
pages = [synthetic.make_page(rng, 3508, 2480, skew_deg=s, degrade=d)[0]
         for s, d in zip(skews, degs)]


def run(det, tag, keep=False):
    t0 = time.time()
    outs = []
    n = 0
    for res in det.process_batch((p, f"eq_{i}.png" if keep else f"{tag}_{i}.png")
                                 for i, p in enumerate(pages)):
        n += len(res.contours)
        if keep:
            outs.append((res.slopes,
                         [len(t) for t in res.textlines],
                         [np.concatenate(t).astype(np.float64)
                          if t else np.zeros((0, 2)) for t in res.textlines],
                         re.sub(rb"<Metadata>.*?</Metadata>", b"",
                                ET.tostring(res.xml_tree.getroot()),
                                flags=re.S)))
    dt = time.time() - t0
    print(f"  {tag}: {dt:6.2f}s ({n} regions)", flush=True)
    return dt, outs


for name, det in dets.items():
    print(f"[ab] warming {name}...", flush=True)
    t0 = time.time()
    det.warm_up(3508, 2480)
    print(f"[ab] warm {name}: {time.time()-t0:.1f}s", flush=True)
    run(det, f"warm{name}")

_, out_s = run(dets["S"], "eqS", keep=True)
_, out_n = run(dets["N"], "eqN", keep=True)
bad = 0
for i, (a, b) in enumerate(zip(out_s, out_n)):
    assert a[0] == b[0], f"page {i}: slopes differ {a[0]} vs {b[0]}"
    if a[3] == b[3]:
        continue
    # quantify the divergence: line counts + max line-coordinate delta
    # (the S-vs-N contract is value-level; f32 einsum accumulation order
    # differs between crop-buffer sizes, so peak positions may wiggle)
    counts_eq = a[1] == b[1]
    max_d = 0.0
    for pa, pb in zip(a[2], b[2]):
        if pa.shape == pb.shape and pa.size:
            max_d = max(max_d, float(np.abs(pa - pb).max()))
        elif pa.shape != pb.shape:
            max_d = float("inf")
    print(f"[ab] page {i}: XML differs — line counts "
          f"{'EQUAL' if counts_eq else f'{a[1]} vs {b[1]}'}, "
          f"max coord delta {max_d}", flush=True)
    bad += 1
print(f"[ab] equality: {len(out_s)-bad}/{len(out_s)} pages byte-identical",
      flush=True)

wins = {k: 0 for k in dets}
for r in range(3):
    print(f"[ab] round {r}:", flush=True)
    mins = {}
    for name, det in dets.items():
        a, _ = run(det, f"{name}1")
        b, _ = run(det, f"{name}2")
        mins[name] = min(a, b)
    best = min(mins, key=mins.get)
    wins[best] += 1
    print(f"[ab] round {r}: " +
          " ".join(f"{k}={v:.2f}" for k, v in mins.items()) +
          f" -> {best}", flush=True)
print(f"[ab] wins: {wins}", flush=True)

#!/usr/bin/env python
"""End-to-end benchmark: pages/sec for the full textline-detection cascade.

The reference publishes no numbers (SURVEY.md §6; its only instrumentation
is per-stage stdout timing, upstream main.py:2144-2151), so the baseline is
the project target from BASELINE.md: >= 50 pages/sec/chip end-to-end on
300-DPI scans. `vs_baseline` below is value / 50.

Protocol:
  1. Obtain bench checkpoints for the three flagship TpuUnets. Weight
     *values* don't affect speed (same FLOPs), but mask quality drives the
     post-processing load, so random weights would benchmark an unrealistic
     cascade. The harness quick-trains each role on its synthetic task
     (binarization-grade, converges in ~100 steps) and caches the .npz
     checkpoints; cached runs skip training.
  2. Generate 300-DPI-like A4 pages (3508x2480) with multi-column paragraph
     layouts (utils/synthetic.py).
  3. One warm-up page (compiles all tile buckets), then time N pages
     through TextlineDetector.process_image + PAGE-XML serialization.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Repo-local (like jaxenv._REPO_CACHE): /tmp is wiped between container
# sessions and a cold XLA cache costs ~200 s of page-shape compiles.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

def _ensure_native() -> None:
    """Best-effort build of the C++ host-geometry library: the bench must
    measure the native path, not the numpy fallbacks, on a fresh checkout."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        subprocess.run(["make", "-C", os.path.join(here, "native")],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        _log("[bench] WARNING: native build failed; numpy fallbacks in use")


TARGET_PAGES_PER_SEC = 50.0
# Peak bf16 MXU throughput of one v5e chip (FLOP/s) for the MFU estimate.
PEAK_FLOPS = float(os.environ.get("SBB_BENCH_PEAK_FLOPS", 197e12))
# Versioned cache dir: bump the suffix whenever the flagship architecture
# or the synthetic training task changes, so stale checkpoints retrain
# instead of failing validation (CLAUDE.md). v5 = v4 (narrow
# FLAGSHIP_WIDTHS trunk + hardened corpus) + vertical-texture pages in
# the border-model task (page_batch) — without them the border model
# cropped away whole columns of vertical-text pages. v6-v8 iterated
# patch-level figure hardening and each REGRESSED the bench (paired
# quality probe, PERF.md figure-precision ladder: v8 fragmented
# paragraphs next to figures and doubled the speck FPs it targeted;
# overall precision 0.947 -> 0.847). v9-v10 abandon that line: half the
# dual-head batches are crops of FULL rendered pages at serve-exact
# working resolution (synthetic._render_pool_page — same NEAREST global
# resize, page-global Otsu scope, PIL skew rotation, real figure
# interiors/edges, bleed, vertical), closing the train/serve gap by
# construction instead of by approximation. v9 (x3 schedule, 900 steps)
# under-trained the broader distribution (mean precision 0.887); v10 is
# the same stream at the x6 schedule (1800 steps): mean precision 0.983,
# recall 1.0, every figure-page speck FP gone (paired probe 2026-08-19).
# v11 (tried, REVERTED): pinning 3 vertical + 2 high-skew pool pages
# did not move vertical line recall (0.975 unchanged) and cost
# figure-page precision 0.983 -> 0.913 (page 6: 0.611, 7 speck FPs)
# — the v10 random mix's figure coverage was load-bearing. The
# vertical residual is not a coverage problem (r5 TPU probe).
# Repo-local (.gitignored): /tmp is wiped between container sessions and
# the v10 dual-head schedule costs ~15 min of TPU training to rebuild.
_CKPT_CACHE = os.environ.get(
    "SBB_BENCH_CKPT_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".cache", "bench_ckpts_v10"))


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_ensure_native()


def ensure_bench_checkpoints(ckpt_dir: str, steps: int, seed: int = 0) -> str:
    """Train-or-load the three bench checkpoints; returns the directory."""
    import jax
    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
    from sbb_textline_detection_tpu.models import checkpoint, registry
    from sbb_textline_detection_tpu.training import train
    from sbb_textline_detection_tpu.utils import synthetic

    os.makedirs(ckpt_dir, exist_ok=True)
    names = DEFAULT_CONFIG.model_names
    # The dual-head flagship serves the region AND textline roles with one
    # shared-trunk forward (registry.DUALHEAD_SPEC) — it trains on the
    # joint task and halves the fused segmentation cost per page.
    for role in ("page", "dualhead"):
        path = checkpoint.checkpoint_path(ckpt_dir, getattr(names, role))
        if os.path.exists(path):
            continue
        spec = (registry.DUALHEAD_SPEC if role == "dualhead"
                else registry.DEFAULT_SPECS[role])
        # the joint task optimizes two objectives through one trunk AND
        # covers the hardened distribution (vertical text, figures,
        # bleed, ±25° rotation) PLUS the page-crop stream's full serve
        # distribution; x6 schedule (v10 ladder: x3/900 steps left speck
        # FPs on 6 of 8 probe pages at mean precision 0.887, x6/1800
        # cleared them at 0.983 — the broader stream needs the extra
        # optimization, and the narrow trunk trains ~4x faster per step)
        role_steps = steps * 6 if role == "dualhead" else steps
        _log(f"[bench] training {role} checkpoint "
             f"({role_steps} steps) -> {path}")
        trainer = train.Trainer(spec, learning_rate=3e-4, seed=seed)
        rng = np.random.default_rng(seed)
        batch_fn = synthetic.BATCH_FNS[role]

        def data_iter():
            while True:
                imgs, labels = batch_fn(
                    rng, 8, spec.input_height, spec.input_width)
                yield imgs, labels

        t0 = time.time()
        losses = trainer.train(data_iter(), role_steps)
        jax.block_until_ready(trainer.variables)
        _log(f"[bench] {role}: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
             f"({time.time() - t0:.1f}s)")
        trainer.save(path)
    return ckpt_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int,
                    default=int(os.environ.get("SBB_BENCH_PAGES", 8)),
                    help="number of timed pages (8: long enough that the "
                         "pipelined batch reaches steady state — 4-page "
                         "batches under-report throughput ~20%)")
    ap.add_argument("--train-steps", type=int,
                    default=int(os.environ.get("SBB_BENCH_TRAIN_STEPS", 300)))
    # 300 (x6 for the dual-head joint task, see ensure_bench_checkpoints):
    # the 150-step schedule left the hardened sub-distributions visibly
    # undertrained (figure-page precision 0.664), and the page-crop
    # stream needs the x6 dual-head schedule (precision ladder in
    # PERF.md); training cost ~18 min once per cache version.
    ap.add_argument("--ckpt-dir", default=_CKPT_CACHE)
    ap.add_argument("--page-height", type=int, default=3508)
    ap.add_argument("--page-width", type=int, default=2480)
    args = ap.parse_args()

    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
    from sbb_textline_detection_tpu.models.runner import ModelBundle
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector
    from sbb_textline_detection_tpu.utils import synthetic

    # Absorb the first-dispatch tunnel stall (~10-30s) concurrently with
    # host-side setup (page generation, checkpoint load).
    import threading

    tunnel_stats = {}

    def _tunnel_warm():
        import jax
        import jax.numpy as jnp
        t0 = time.time()
        np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 128), jnp.float32)))
        tunnel_stats["seconds"] = time.time() - t0

    warm_thread = threading.Thread(target=_tunnel_warm, daemon=True)
    warm_thread.start()

    # env-var cache config is ignored by the TPU plugin (CLAUDE.md); the
    # jax.config route must be live BEFORE checkpoint training compiles
    from sbb_textline_detection_tpu.core import jaxenv
    jaxenv.enable_compilation_cache()

    ensure_bench_checkpoints(args.ckpt_dir, args.train_steps)
    models = ModelBundle.from_dir(args.ckpt_dir, DEFAULT_CONFIG.runtime,
                                  DEFAULT_CONFIG.model_names)
    detector = TextlineDetector(models, DEFAULT_CONFIG)

    rng = np.random.default_rng(7)
    # Hardened corpus (VERDICT r3 #3): the mix spans the reference's FULL
    # deskew sweep (±25°, main.py:1620) — not just mild ±8° skew — plus a
    # vertical-text page (the [-90,-50] sweep + seperate_lines_vertical
    # path, main.py:1669-1714/993), non-text figures and separator rules
    # (false-positive pressure on region_precision), and verso
    # bleed-through combined with skew/degradation. Gates for FLOP-cut
    # rounds: region/line recall must hold 1.0 and region precision
    # >= 0.97 on THIS mix (VERDICT r3 #1); the figure/vertical metrics
    # below are expected < 1.0 (headroom the corpus keeps visible).
    #          skew   degrade figs bleed vertical
    hard_mix = [
        (0.0,   0.8,   0,   0.0,  False),  # degraded clean page
        (18.0,  0.0,   2,   0.0,  False),  # high skew + figures
        (0.0,   0.0,   0,   0.0,  True),   # vertical text
        (-8.0,  0.8,   0,   0.4,  False),  # skew + degrade + bleed
        (0.0,   0.8,   2,   0.35, False),  # degrade + figures + bleed
        (24.0,  0.0,   0,   0.35, False),  # near-max sweep skew + bleed
        (0.0,   0.0,   3,   0.0,  False),  # clean + figures/rules
        (-15.0, 0.0,   0,   0.0,  False),  # vertical-trigger boundary skew
    ]
    mix = [hard_mix[i % len(hard_mix)] for i in range(args.pages)]
    skews = [m[0] for m in mix]
    degrades = [m[1] for m in mix]
    pages_layouts = [synthetic.make_page(rng, args.page_height,
                                         args.page_width, skew_deg=m[0],
                                         degrade=m[1], figures=m[2],
                                         bleed=m[3], vertical=m[4])
                     for m in mix]
    pages = [p for p, _ in pages_layouts]
    layouts = [l for _, l in pages_layouts]

    # Warm-up pass over every page THROUGH THE BATCH PATH (the timed pass
    # uses process_batch, whose grouped multi-page programs are distinct
    # compilations from the single-page ones): compiles each grid/group
    # shape once, persisted to the XLA compile cache for later runs.
    _log("[bench] warm-up pass (compilation)...")
    warm_thread.join()
    t0 = time.time()
    # parallel first-dispatch of all device programs (program loads
    # through the tunnel overlap), then one full pass over the real pages
    # to cover any remaining shape variants
    warm_timings = detector.warm_up(args.page_height, args.page_width)
    _log(f"[bench] program loads (parallel): " + ", ".join(
        f"{k}={v:.1f}s" for k, v in sorted(warm_timings.items())))
    t_pass = time.time()
    warm_page_walls = []
    for _ in detector.process_batch(
            (p, f"warmup_{i}.png") for i, p in enumerate(pages)):
        warm_page_walls.append(time.time() - t_pass)
        t_pass = time.time()
    warm_up_seconds = time.time() - t0
    # per-page walls of the warm pass: a page that stalls multiple seconds
    # here is minting a program shape the parallel warm set missed
    _log("[bench] warm pass pages: "
         + " ".join(f"{w:.1f}" for w in warm_page_walls))
    _log(f"[bench] warm-up took {warm_up_seconds:.1f}s")

    # Timed pass uses the pipelined batch executor (the product's
    # directory/batch mode): device phase of page N+1 overlaps host phase
    # of page N. Per-page latency comes from the per-stage timers.
    from sbb_textline_detection_tpu.training import eval as eval_mod

    stage_sums: dict = {}
    device_sums: dict = {}
    flops_total = 0.0
    regions = lines = 0
    lat = []
    results = []
    t_start = time.time()
    for i, res in enumerate(detector.process_batch(
            (p, f"bench_{i}.png") for i, p in enumerate(pages))):
        # only bookkeeping inside the timed loop — quality evaluation is
        # not serving work and competes for the single host core
        results.append(res)
        lat.append(res.timings["total"])
        flops_total += res.flops
    total = time.time() - t_start

    scores = []
    for i, res in enumerate(results):
        regions += len(res.contours)
        lines += sum(len(t) for t in res.textlines)
        scores.append(eval_mod.evaluate_layout(res, layouts[i]))
        for k, v in res.timings.items():
            stage_sums[k] = stage_sums.get(k, 0.0) + v
        for k, v in res.device_timings.items():
            device_sums[k] = device_sums.get(k, 0.0) + v
        _log(f"[bench] page {i} (skew {layouts[i].skew_deg:+.1f}°): "
             f"{res.timings['total']:.2f}s "
             f"({len(res.contours)} regions, "
             f"recall {scores[-1].region_recall:.2f}, "
             f"line recall {scores[-1].line_recall:.2f})")

    pages_per_sec = len(pages) / total
    p50_ms = float(np.percentile(lat, 50) * 1000.0)
    result = {
        "metric": "pages_per_sec_end_to_end_300dpi",
        "value": round(pages_per_sec, 4),
        "unit": "pages/sec/chip",
        "vs_baseline": round(pages_per_sec / TARGET_PAGES_PER_SEC, 4),
        "p50_latency_ms": round(p50_ms, 1),
        "pages": len(pages),
        "regions_total": regions,
        "lines_total": lines,
        "quality": {
            "region_recall": round(float(np.nanmean(
                [s.region_recall for s in scores])), 3),
            "region_precision": round(float(np.nanmean(
                [s.region_precision for s in scores])), 3),
            "line_count_mae": round(float(np.nanmean(
                [s.line_count_mae for s in scores])), 3),
            "line_recall": round(float(np.nanmean(
                [s.line_recall for s in scores])), 3),
            "line_recall_skewed": round(float(np.nanmean(
                [s.line_recall for s, l in zip(scores, layouts)
                 if l.skew_deg != 0.0] or [float("nan")])), 3),
            "line_recall_degraded": round(float(np.nanmean(
                [s.line_recall for s, d in zip(scores, degrades)
                 if d > 0.0] or [float("nan")])), 3),
            "region_recall_degraded": round(float(np.nanmean(
                [s.region_recall for s, d in zip(scores, degrades)
                 if d > 0.0] or [float("nan")])), 3),
            "region_precision_degraded": round(float(np.nanmean(
                [s.region_precision for s, d in zip(scores, degrades)
                 if d > 0.0] or [float("nan")])), 3),
            "line_recall_highskew": round(float(np.nanmean(
                [s.line_recall for s, m in zip(scores, mix)
                 if abs(m[0]) >= 15.0] or [float("nan")])), 3),
            "line_recall_vertical": round(float(np.nanmean(
                [s.line_recall for s, m in zip(scores, mix)
                 if m[4]] or [float("nan")])), 3),
            "region_precision_figures": round(float(np.nanmean(
                [s.region_precision for s, m in zip(scores, mix)
                 if m[2] > 0] or [float("nan")])), 3),
            "skews_deg": skews,
            "degrade_strengths": degrades,
            "figures": [m[2] for m in mix],
            "bleed": [m[3] for m in mix],
            "vertical": [m[4] for m in mix],
        },
        "stage_seconds_per_page": {
            k: round(v / len(pages), 3) for k, v in sorted(stage_sums.items())},
        # host-observed device dispatch+transfer seconds per stage: the gap
        # to stage_seconds is pure host work (1-core VM); MFU is XLA cost
        # model FLOPs / wall / chip bf16 peak.
        "device_seconds_per_page": {
            k: round(v / len(pages), 3)
            for k, v in sorted(device_sums.items())},
        "host_seconds_per_page": round(
            (stage_sums.get("total", 0.0) - device_sums.get("total", 0.0))
            / len(pages), 3),
        "flops_per_page": round(flops_total / len(pages)),
        "mfu": round(flops_total / max(total, 1e-9) / PEAK_FLOPS, 5),
        # Cold-start split: `tunnel_establish_seconds` is the serving
        # environment's first-contact stall (a tiny jit dispatched at
        # process start; observed 90-470 s through the tunnel — an
        # environment constant, absorbed concurrently with setup), and
        # `warm_up_seconds` is the controllable part: program compiles /
        # cache loads / first dispatches for the pipeline's programs.
        "tunnel_establish_seconds": round(tunnel_stats.get("seconds", 0.0), 1),
        "warm_up_seconds": round(warm_up_seconds, 1),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

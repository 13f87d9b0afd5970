"""Stage ablation of the fused segmentation program at the r4/r5 widths
(VERDICT r4 #2): cumulative exec wall per stage, built up exactly like
the resident-deskew ablation (PERF.md). Mirrors the production raw-path
program stage by stage (runner._dual_tiled_resident_fn fn_raw/_core,
k=1, gray plane, projection mode, bits1) using the SAME building blocks
(otsu_threshold_masked, _fused_forward_pair, _apply_morph, pack); each
variant returns a scalar sum (latency-only fetch), so marginals are pure
execution; the last rows measure the real program + real blob fetch."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import ensure_bench_checkpoints, _CKPT_CACHE
from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.ops import pack as pack_ops
from sbb_textline_detection_tpu.ops import resize as resize_ops
from sbb_textline_detection_tpu.ops import threshold
from sbb_textline_detection_tpu.pipeline import stages
from sbb_textline_detection_tpu.utils import synthetic

import jax
import jax.numpy as jnp

CK = os.environ.get("SBB_AB_CKPTS", _CKPT_CACHE)
ensure_bench_checkpoints(CK, 300)
models = ModelBundle.from_dir(CK, DEFAULT_CONFIG.runtime,
                              DEFAULT_CONFIG.model_names)
cfg = DEFAULT_CONFIG
m = models.region  # dual-head flagship
other = models.textline

rng = np.random.default_rng(7)
page = synthetic.make_page(rng, 3508, 2480, skew_deg=2.5)[0][:, :, 0]
th, tw = stages.working_dims(np.repeat(page[:, :, None], 3, axis=2), cfg)
# production-like crop box (an A4 border crop is slightly inside)
box = [40, 30, th - 80, tw - 60]
mh, mw = m.input_hw
margin = int(cfg.tiling.margin_ratio * mw)
sh, sw = mh - 2 * margin, mw - 2 * margin
ny, nx = m.grid_for(box[2], box[3], cfg.tiling.margin_ratio)
ch, cw = m.canvas_shape_for(th, tw, cfg.tiling.margin_ratio)
raw_dev = jax.device_put(page)   # unpadded: the ablation compiles on
raw_h, raw_w = page.shape        # the exact page shape
iy = np.full(ch, -1, np.int32)
ix = np.full(cw, -1, np.int32)
iy[margin:margin + th] = resize_ops._nearest_indices(th, raw_h)
ix[margin:margin + tw] = resize_ops._nearest_indices(tw, raw_w)
n = ny * nx
total = n
chunk = min(m.runtime.tile_chunk, total)
n_pad = ((total + chunk - 1) // chunk) * chunk
jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
jjr = jnp.asarray(jj.ravel() * sh, jnp.int32)
iir = jnp.asarray(ii.ravel() * sw, jnp.int32)
k_m = cfg.morphology.kernel_size
MORPH = (("erode", k_m, cfg.morphology.region_erode_iterations),
         ("dilate", k_m, cfg.morphology.region_dilate_iterations))
POST = (("open", k_m, 1), ("close", k_m, 1))
MASK_CLASS = cfg.region.text_class_value
big_h, big_w = ny * sh, nx * sw
print(f"[ablate] grid {ny}x{nx} canvas {ch}x{cw} big {big_h}x{big_w} "
      f"chunk {chunk} n_pad {n_pad}", flush=True)

boxes_a = jnp.asarray([box], jnp.int32)
iy_a = jnp.asarray(iy[None])
ix_a = jnp.asarray(ix[None])


def build(stage):
    def fn(vars_r, vars_t, raws_u8, boxes_in, iy_map, ix_map):
        def build_canvas(raw, iyb, ixb):
            rows = jnp.take(raw, jnp.clip(iyb, 0, raw_h - 1), axis=0)
            cv = jnp.take(rows, jnp.clip(ixb, 0, raw_w - 1), axis=1)
            ok = (iyb[:, None] >= 0) & (ixb[None, :] >= 0)
            cv = cv[..., None]
            return jnp.where(ok[..., None], cv, jnp.uint8(255))

        canvases = jax.vmap(build_canvas)(raws_u8, iy_map, ix_map)
        canvases = jnp.broadcast_to(canvases, canvases.shape[:3] + (3,))
        boxes = boxes_in
        ph, pw = canvases.shape[1:3]
        iyg = jnp.arange(ph, dtype=jnp.int32)[:, None]
        ixg = jnp.arange(pw, dtype=jnp.int32)[None, :]

        def whiten(img, b):
            inside = ((iyg >= margin + b[0]) & (iyg < margin + b[0] + b[2])
                      & (ixg >= margin + b[1]) & (ixg < margin + b[1] + b[3]))
            return jnp.where(inside[..., None], img, jnp.uint8(255))

        imgs = jax.vmap(whiten)(canvases, boxes)
        if stage == "gather":
            return jnp.sum(imgs.astype(jnp.float32))

        def page_thresh(img, b):
            inside = ((iyg >= margin + b[0]) & (iyg < margin + b[0] + b[2])
                      & (ixg >= margin + b[1]) & (ixg < margin + b[1] + b[3]))
            return threshold.otsu_threshold_masked(img[..., 0], inside)

        ts = jax.vmap(page_thresh)(imgs, boxes)
        if stage == "otsu":
            return jnp.sum(imgs.astype(jnp.float32)) + jnp.sum(ts)

        def page_tiles(img, b):
            return jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                img, (b[0] + yy, b[1] + xx, 0), (mh, mw, 3)))(jjr, iir)

        tiles = jax.vmap(page_tiles)(imgs, boxes).reshape(total, mh, mw, 3)
        t_tiles = jnp.repeat(ts, n)
        if n_pad > total:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((n_pad - total, mh, mw, 3), tiles.dtype)])
            t_tiles = jnp.concatenate(
                [t_tiles, jnp.zeros((n_pad - total,), t_tiles.dtype)])
        if stage == "tiles":
            return jnp.sum(tiles.astype(jnp.float32)) + jnp.sum(t_tiles)

        labels_r, labels_t = m._fused_forward_pair(
            other, vars_r, vars_t, tiles, t_tiles, chunk)
        if stage == "forward":
            return (jnp.sum(labels_r.astype(jnp.float32))
                    + jnp.sum(labels_t.astype(jnp.float32)))

        def stitch(labels):
            labels = labels.reshape(n_pad, mh, mw)[:total]
            slabs = labels[:, margin:margin + sh, margin:margin + sw]
            return (slabs.reshape(1, ny, nx, sh, sw)
                    .transpose(0, 1, 3, 2, 4).reshape(1, big_h, big_w))

        canvas_r = stitch(labels_r)
        canvas_t = stitch(labels_t)
        if stage == "stitch":
            return (jnp.sum(canvas_r.astype(jnp.float32))
                    + jnp.sum(canvas_t.astype(jnp.float32)))

        def shape_page(c, b, morph_spec, post):
            ins = ((jnp.arange(big_h, dtype=jnp.int32)[:, None] < b[2])
                   & (jnp.arange(big_w, dtype=jnp.int32)[None, :] < b[3]))
            c = m._apply_morph(c, morph_spec, ins)
            if post is not None:
                c = (c == np.uint8(MASK_CLASS)).astype(jnp.uint8)
                c = m._apply_morph(c, post, ins)
            return c

        if stage == "labelmorph":
            cr = jax.vmap(lambda c, b: shape_page(c, b, MORPH, None))(
                canvas_r, boxes)
            return (jnp.sum(cr.astype(jnp.float32))
                    + jnp.sum(canvas_t.astype(jnp.float32)))
        canvas_r = jax.vmap(lambda c, b: shape_page(c, b, MORPH, POST))(
            canvas_r, boxes)
        if stage == "maskmorph":
            return (jnp.sum(canvas_r.astype(jnp.float32))
                    + jnp.sum(canvas_t.astype(jnp.float32)))

        cols = jnp.arange(big_w, dtype=jnp.int32)[None, :]
        rowsum = jax.vmap(lambda c, b: jnp.sum(
            jnp.where(cols < b[3], c, jnp.uint8(0)).astype(jnp.int32),
            axis=1))(canvas_t, boxes)
        blob = jnp.concatenate(
            [pack_ops.pack1_device(canvas_r.reshape(big_h, big_w)),
             jax.lax.bitcast_convert_type(rowsum, jnp.uint8).reshape(-1)])
        if stage == "pack_sum":
            return jnp.sum(blob.astype(jnp.float32))
        return blob, canvas_t          # "full": real outputs

    return fn


STAGES = ["gather", "otsu", "tiles", "forward", "stitch", "labelmorph",
          "maskmorph", "pack_sum", "full"]
compiled = {}
for st in STAGES:
    t0 = time.time()
    compiled[st] = jax.jit(build(st)).lower(
        m.variables, other.variables,
        jax.ShapeDtypeStruct((1,) + page.shape, jnp.uint8),
        jax.ShapeDtypeStruct((1, 4), jnp.int32),
        jax.ShapeDtypeStruct((1, ch), jnp.int32),
        jax.ShapeDtypeStruct((1, cw), jnp.int32)).compile()
    print(f"[ablate] compiled {st} in {time.time()-t0:.1f}s", flush=True)

# warm loads
for st in STAGES:
    out = compiled[st](m.variables, other.variables, raw_dev[None],
                       boxes_a, iy_a, ix_a)
    np.asarray(out[0] if isinstance(out, tuple) else out).reshape(-1)[:8]
print("[ablate] warm done", flush=True)

REPS = 6
prev = 0.0
rows = []
for st in STAGES:
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        out = compiled[st](m.variables, other.variables, raw_dev[None],
                           boxes_a, iy_a, ix_a)
        if isinstance(out, tuple):
            blob = np.asarray(out[0])     # the real fetch
        else:
            float(out)
        walls.append(time.time() - t0)
    best = min(walls)
    rows.append((st, best, best - prev))
    print(f"[ablate] {st:10s} {best*1e3:7.1f}ms  (marginal "
          f"{(best-prev)*1e3:+7.1f}ms)", flush=True)
    prev = best
print("[ablate] blob bytes:", len(blob), flush=True)

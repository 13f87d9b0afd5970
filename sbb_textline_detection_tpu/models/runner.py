"""Inference engine: batched whole-image and overlapped-patch prediction.

TPU-native replacement for the reference's `do_prediction`
(upstream main.py:225-380). Differences by design:

  * the reference predicts one tile per `model.predict` call in a Python
    loop (main.py:259-288, batch size 1); here the page is uploaded ONCE
    and tiles are extracted, predicted (in fixed-size chunks under
    `lax.map`, bounding activation memory), stitched, and post-morphed in
    a single jit — one dispatch per page per model;
  * normalization (/255, main.py:239) and argmax (main.py:290) happen on
    device inside the same jit; the result crosses back to host as a 2-bit
    packed label map (ops/pack.py) because the serving environment's
    device->host path is far slower than host->device;
  * stitching uses the exact 9-case seam-trimming index math of the
    reference (ops/tiling.py), realized as statically-indexed updates;
  * the working page is padded (white) up to a multiple of the tile stride
    before gridding, so all pages of similar size share one compiled
    program. The reference instead shifts edge tiles inward on the exact
    image (main.py:276-281); the stitched label map is equivalent up to
    prediction noise at the padded border, which is cropped away.
  * whole-image mode resizes input to model geometry on host (small),
    predicts once, and nearest-resizes the argmax label map back on host
    (main.py:368-379) — no full-resolution device traffic at all.
"""

from __future__ import annotations

import functools
import threading
import time as _time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sbb_textline_detection_tpu.core.config import RuntimeConfig
from sbb_textline_detection_tpu.models import registry
from sbb_textline_detection_tpu.models.registry import ModelSpec
from sbb_textline_detection_tpu.ops import morphology
from sbb_textline_detection_tpu.ops import pack as pack_ops
from sbb_textline_detection_tpu.ops import resize as resize_ops
from sbb_textline_detection_tpu.ops import tiling
from sbb_textline_detection_tpu.utils import stagetime

# Post-prediction morphology fused into the device program:
# tuple of ("erode"|"dilate", kernel_size, iterations).
MorphSpec = Tuple[Tuple[str, int, int], ...]


def _balanced_chunk(total: int, cap: int) -> int:
    """Largest lax.map chunk <= cap that divides the tile batch into
    equal-size steps with (near-)zero padding: ceil(total/steps) for the
    smallest step count whose chunk fits the cap. `min(cap, total)`
    alone pads the batch up to a chunk multiple — a 108-tile grid at the
    default cap 96 ran 2x96 = 192 tile forwards, 44% of the segmentation
    FLOPs on padding tiles (PERF.md round-5 fused ablation); 2x54
    computes exactly 108. The cap still bounds activation memory."""
    steps = -(-total // max(1, min(cap, total)))
    return -(-total // steps)


class DeferredFusedRaw:
    """Dispatched-but-unfetched result of the single-page raw fused
    program (predict_dual_tiled_resident_raw(defer_fetch=True)): exposes
    the ON-DEVICE outputs so follow-up programs (the speculative resident
    deskew, pipeline/deskew.py) can be enqueued behind it BEFORE the host
    blocks on the blob transfer; fetch() then completes the ordinary
    return contract."""

    def __init__(self, res, boxes, ny, nx, sh, sw, bits1, keep_dev, proj,
                 packed_nbytes, flops):
        self.res = res
        self.boxes = boxes
        self.ny, self.nx, self.sh, self.sw = ny, nx, sh, sw
        self.bits1 = bits1
        self.keep_dev = keep_dev
        self.proj = proj
        self.packed_nbytes = packed_nbytes
        self.flops = flops

    @property
    def big_hw(self) -> Tuple[int, int]:
        return (self.ny * self.sh, self.nx * self.sw)

    @property
    def blob_dev(self):
        """The packed device blob (region canvas bytes first)."""
        return self.res[0] if isinstance(self.res, tuple) else self.res

    @property
    def textline_dev(self):
        if not self.keep_dev:
            return None
        stack = self.res[1]
        return stack[0] if stack.ndim == 3 else stack

    def fetch(self):
        """Block on the blob transfer and return what the non-deferred
        call would have: the single page's fused tuple."""
        with stagetime.device_section(self.flops):
            packed, projs, textline_stack = \
                SegmentationModel._split_dual_outputs(
                    self.res, self.keep_dev, self.proj,
                    self.packed_nbytes, (1, self.ny * self.sh))
        return SegmentationModel._unpack_dual_pages(
            packed, projs, textline_stack, self.boxes, self.ny, self.nx,
            self.sh, self.sw, self.bits1, self.keep_dev, self.proj)[0]


def _serialize_compiles(fn):
    """Hold the model's compile lock for the whole cached-compile helper:
    process_batch runs device_phase_workers concurrent device phases, and
    two workers missing the same cold cache key would otherwise both pay
    the 10-30 s compile AND the 5-30 s first-dispatch program load. The
    guarded helpers only compile (no dispatches), so the lock never
    serializes device work; cache hits pay one dict lookup under an
    uncontended RLock."""
    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._compile_lock:
            return fn(self, *args, **kwargs)
    return wrapper


def _page_box_from_small(module, variables, img_u8, th, tw):
    """Page forward + the ENTIRE box decision on device (forward,
    threshold, dilate, largest component, boundingRect, exact
    nearest-upscale index math): the reference chain main.py:368-373 +
    394-404 at model resolution (stages._page_box_model_res semantics,
    DEVIATIONS.md #9) with NO device->host fetch. `th`/`tw` are the
    working dims — traced int32 scalars (page_box_dev) or static Python
    ints (the fully-fused program). Returns the (1, 5) int32
    [[by, bx, h, w, valid]]."""
    from sbb_textline_detection_tpu.ops import cc as cc_ops
    from sbb_textline_detection_tpu.ops import morphology as morph_ops

    x = img_u8[None].astype(jnp.float32) / 255.0
    logits = module.apply(variables, x)
    labels = jnp.argmax(logits[0], axis=-1).astype(jnp.uint8)
    mh_, mw_ = labels.shape
    dil = morph_ops.dilate((labels != 0).astype(jnp.uint8), 3, 1)
    box, valid = cc_ops.largest_component_box(dil)
    bx, by, bw, bh = box[0], box[1], box[2], box[3]
    # full-res pixels whose nearest source index is j span
    # [ceil(j*W/mw), ceil((j+1)*W/mw) - 1] (ops/resize.py math)
    x0 = -(-(bx * tw) // mw_)
    x1 = -(-((bx + bw) * tw) // mw_) - 1
    y0 = -(-(by * th) // mh_)
    y1 = -(-((by + bh) * th) // mh_) - 1
    w_ = jnp.maximum(1, x1 - x0 + 1)
    h_ = jnp.maximum(1, y1 - y0 + 1)
    one = jnp.int32(1)
    zero = jnp.int32(0)
    # invalid (empty mask) -> the whole image with the reference's
    # off-by-one shape quirk (main.py:406-426; stages.extract_page
    # except path): [y, x, h, w] = [0, 0, th-1, tw-1]
    out = jnp.where(valid,
                    jnp.stack([y0, x0, h_, w_, one]),
                    jnp.stack([zero, zero,
                               jnp.asarray(th - 1, jnp.int32),
                               jnp.asarray(tw - 1, jnp.int32), zero]))
    # (1, 5): feeds the fused program's (k=1, 5) boxes input with
    # no intervening reshape dispatch
    return out.astype(jnp.int32)[None]


def _pad_white(img_u8: np.ndarray, top: int, bottom: int, left: int,
               right: int) -> np.ndarray:
    """Constant-255 border pad. np.pad's generic path costs ~115 ms on the
    1-core serving host for a full page; full+assign is two memcpy-speed
    passes."""
    h, w = img_u8.shape[:2]
    out = np.full((h + top + bottom, w + left + right) + img_u8.shape[2:],
                  255, dtype=img_u8.dtype)
    out[top:top + h, left:left + w] = img_u8
    return out


def _validate_variables(module, spec: ModelSpec, variables) -> None:
    """Fail loudly on checkpoint/architecture mismatch (a stale checkpoint
    would otherwise surface as a caught exception deep in the pipeline and
    silently degrade every page to an empty PAGE-XML)."""
    expected = jax.eval_shape(
        module.init, jax.random.PRNGKey(0),
        jnp.zeros((1, spec.input_height, spec.input_width,
                   spec.in_channels), jnp.float32))
    exp = {jax.tree_util.keystr(k): v.shape for k, v in
           jax.tree_util.tree_flatten_with_path(expected)[0]}
    got = {jax.tree_util.keystr(k): np.shape(v) for k, v in
           jax.tree_util.tree_flatten_with_path(variables)[0]}
    if exp != got:
        missing = sorted(set(exp) - set(got))
        extra = sorted(set(got) - set(exp))
        wrong = sorted(k for k in set(exp) & set(got) if exp[k] != got[k])
        raise ValueError(
            f"checkpoint does not match architecture {spec.arch!r} "
            f"(model {spec.name!r}): missing={missing[:5]} "
            f"unexpected={extra[:5]} shape-mismatch={wrong[:5]} "
            "— re-run the checkpoint converter / retrain")


class SegmentationModel:
    """One loaded segmentation model with cached, shape-bucketed jit paths."""

    def __init__(self, spec: ModelSpec, variables,
                 runtime: RuntimeConfig | None = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — the tile
        batch of every page shards across it inside the one-dispatch tiled
        program (the multi-chip spatial parallelism of SURVEY §2.4: one
        page's patch grid spread over ICI; weights replicated)."""
        self.spec = spec
        self.runtime = runtime or RuntimeConfig()
        self.mesh = mesh
        self._module = registry.build_module(spec)
        self._tiled_cache = {}
        self._compile_lock = threading.RLock()
        _validate_variables(self._module, spec, variables)
        # Pin weights on device once: numpy leaves would re-upload the full
        # parameter set on EVERY dispatch (~2.5s/call over the tunnel).
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())
            self.variables = jax.device_put(
                variables, jax.tree_util.tree_map(lambda _: rep, variables))
        else:
            self.variables = jax.device_put(variables)

        @jax.jit
        def _forward_labels(variables, batch_u8):
            x = batch_u8.astype(jnp.float32) / 255.0
            logits = self._module.apply(variables, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        self._forward_labels_jit = _forward_labels
        self._labels_cache = {}

        @jax.jit
        def _forward_whole_packed(variables, img_u8):
            x = img_u8[None].astype(jnp.float32) / 255.0
            logits = self._module.apply(variables, x)
            labels = jnp.argmax(logits[0], axis=-1).astype(jnp.uint8)
            return pack_ops.pack2_device(labels)

        self._forward_whole_jit = _forward_whole_packed
        self._whole_compiled = None

        @jax.jit
        def _forward_whole_batch_packed(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            logits = self._module.apply(variables, x)
            labels = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            return pack_ops.pack2_device(labels)

        self._forward_whole_batch_jit = _forward_whole_batch_packed
        self._whole_batch_compiled = {}

        @jax.jit
        def _forward_box(variables, img_u8, dims_i32):
            return _page_box_from_small(self._module, variables, img_u8,
                                        dims_i32[0], dims_i32[1])

        self._forward_box_jit = _forward_box
        self._box_compiled = None

    def _aot(self, jitted, *args):
        """AOT-compile once: (compiled, flops). The compiled object is the
        only dispatch path (calling the jit wrapper after lower/compile
        would compile a second copy), and its XLA cost analysis feeds the
        per-stage FLOPs ledger."""
        compiled = jitted.lower(*args).compile()
        return compiled, stagetime.flops_of(compiled)

    # -- geometry ----------------------------------------------------------
    @property
    def input_hw(self) -> Tuple[int, int]:
        return self.spec.input_height, self.spec.input_width

    @property
    def n_classes(self) -> int:
        return self.spec.n_classes

    # -- prediction --------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.runtime.batch_buckets:
            if n <= b:
                return b
        b = self.runtime.batch_buckets[-1]
        return ((n + b - 1) // b) * b

    def predict_labels(self, batch_u8: np.ndarray) -> np.ndarray:
        """(N, h, w, 3) uint8 -> (N, h, w) uint8 labels, chunked by bucket."""
        n = batch_u8.shape[0]
        cap = self.runtime.batch_buckets[-1]
        outs = []
        for start in range(0, n, cap):
            chunk = batch_u8[start:start + cap]
            bucket = self._bucket(chunk.shape[0])
            if chunk.shape[0] < bucket:
                pad = np.zeros((bucket - chunk.shape[0],) + chunk.shape[1:],
                               dtype=chunk.dtype)
                padded = np.concatenate([chunk, pad], axis=0)
            else:
                padded = chunk
            entry = self._labels_cache.get(padded.shape)
            if entry is None:
                with self._compile_lock:
                    entry = self._labels_cache.get(padded.shape)
                    if entry is None:
                        entry = self._aot(self._forward_labels_jit,
                                          self.variables, padded)
                        self._labels_cache[padded.shape] = entry
            compiled, flops = entry
            with stagetime.device_section(flops):
                labels = np.asarray(compiled(self.variables, padded))
            outs.append(labels[:chunk.shape[0]])
        return np.concatenate(outs, axis=0)

    def predict_whole_small(self, img_u8: np.ndarray) -> np.ndarray:
        """Whole-image forward WITHOUT the final upscale: resize to model
        size, predict, argmax; returns the (model_h, model_w) label map.
        One batch-1 dispatch, 2-bit-packed transfer back."""
        mh, mw = self.input_hw
        small = resize_ops.resize_nearest_host(img_u8, mh, mw)
        return self.predict_small_prescaled(small)

    def predict_small_prescaled(self, small_u8: np.ndarray) -> np.ndarray:
        """predict_whole_small when the (model_h, model_w) input was
        already produced — e.g. gathered straight from the ORIGINAL page
        via the exact composed two-stage nearest index map
        (ops/resize.compose_nearest_indices), skipping the full-resolution
        host resize entirely."""
        mh, mw = self.input_hw
        if small_u8.shape[:2] != (mh, mw):
            raise ValueError(f"expected {(mh, mw)} input, got "
                             f"{small_u8.shape[:2]}")
        if self._whole_compiled is None:
            with self._compile_lock:
                if self._whole_compiled is None:
                    self._whole_compiled = self._aot(
                        self._forward_whole_jit, self.variables, small_u8)
        compiled, flops = self._whole_compiled
        with stagetime.device_section(flops):
            packed = np.asarray(compiled(self.variables,
                                         jnp.asarray(small_u8)))
        return pack_ops.unpack2_host(packed, (mh, mw))

    def page_box_dev(self, small_u8: np.ndarray, target_h: int,
                     target_w: int) -> jax.Array:
        """Dispatch the page forward + box decision and return the (1, 5)
        int32 DEVICE array [[by, bx, h, w, valid]] in (target_h, target_w)
        working coordinates — no device->host fetch. The result feeds
        predict_dual_tiled_resident_raw_headless directly, deleting the
        small-label fetch round trip (~35-70 ms on the serving tunnel)
        from every page's device-phase chain. Box semantics ==
        stages._page_box_model_res (pixel-count component areas instead
        of contour polygon areas — DEVIATIONS.md #12)."""
        mh, mw = self.input_hw
        if small_u8.shape[:2] != (mh, mw):
            raise ValueError(f"expected {(mh, mw)} input, got "
                             f"{small_u8.shape[:2]}")
        if self._box_compiled is None:
            with self._compile_lock:
                if self._box_compiled is None:
                    dims_ex = jax.ShapeDtypeStruct((2,), jnp.int32)
                    small_ex = jax.ShapeDtypeStruct((mh, mw, 3), jnp.uint8)
                    self._box_compiled = self._aot(
                        self._forward_box_jit, self.variables, small_ex,
                        dims_ex)
        compiled, flops = self._box_compiled
        # dispatch-only: flops accrue here, the wait happens at the fused
        # program's blob fetch downstream
        with stagetime.device_section(flops):
            return compiled(self.variables, jnp.asarray(small_u8),
                            jnp.asarray([target_h, target_w], jnp.int32))

    def predict_whole_small_batch(self, imgs_u8) -> np.ndarray:
        """K pages' whole-image forwards in ONE dispatch: resize each to
        model size on host, stack, predict, argmax; returns the (K, mh, mw)
        label maps via one 2-bit-packed transfer. Saves (K-1) dispatch+fetch
        round trips (~40 ms each over the serving tunnel) vs K
        predict_whole_small calls."""
        mh, mw = self.input_hw
        smalls = np.stack([
            resize_ops.resize_nearest_host(np.asarray(im), mh, mw)
            for im in imgs_u8])
        return self.predict_smalls_prescaled_batch(smalls)

    def predict_smalls_prescaled_batch(self, smalls_u8,
                                       pad_to: Optional[int] = None
                                       ) -> np.ndarray:
        """K pre-gathered (mh, mw, 3) model-resolution inputs in ONE
        dispatch + one 2-bit-packed fetch — the batched page-box stage of
        process_batch: one (K, mh, mw, 3) forward replaces K per-page
        forward+fetch round trips (reference runs the page model once per
        page, main.py:368-373). `pad_to` pads the batch with white pages up
        to a fixed count so every window of a stream shares one compiled
        program (pad results are dropped). Label maps equal the per-page
        program's up to argmax ties between differently-batched XLA
        fusions; callers that need bit-certainty use the single path."""
        smalls = np.asarray(smalls_u8)
        mh, mw = self.input_hw
        if smalls.ndim != 4 or smalls.shape[1:] != (mh, mw, 3):
            raise ValueError(f"expected (k, {mh}, {mw}, 3) input, got "
                             f"{smalls.shape}")
        k = smalls.shape[0]
        if pad_to is not None and k < pad_to:
            pad = np.full((pad_to - k, mh, mw, 3), 255, np.uint8)
            smalls = np.concatenate([smalls, pad], axis=0)
        kp = smalls.shape[0]
        entry = self._whole_batch_compiled.get(kp)
        if entry is None:
            with self._compile_lock:
                entry = self._whole_batch_compiled.get(kp)
                if entry is None:
                    entry = self._aot(self._forward_whole_batch_jit,
                                      self.variables, smalls)
                    self._whole_batch_compiled[kp] = entry
        compiled, flops = entry
        with stagetime.device_section(flops):
            packed = np.asarray(compiled(self.variables, jnp.asarray(smalls)))
        return pack_ops.unpack2_host(packed, (kp, mh, mw))[:k]

    def predict_whole(self, img_u8: np.ndarray) -> np.ndarray:
        """Whole-image mode (main.py:368-379): resize to model size, predict,
        argmax, nearest-resize the label map back to the input size."""
        h, w = img_u8.shape[:2]
        return resize_ops.resize_nearest_host(
            self.predict_whole_small(img_u8), h, w)

    # -- device-resident tiled path -----------------------------------------
    @staticmethod
    def _morph_primitives(ops: MorphSpec):
        """Decompose open/close into erode/dilate primitives (exact for
        flat SEs). `iterations` on open/close follows cv2.morphologyEx:
        erode x it then dilate x it (close: the reverse) — NOT repeated
        open/close."""
        prims = []
        for op, k, it in ops:
            if op in ("erode", "dilate"):
                prims.append((op, k, it))
            elif op == "open":
                prims += [("erode", k, max(1, it)), ("dilate", k, max(1, it))]
            elif op == "close":
                prims += [("dilate", k, max(1, it)), ("erode", k, max(1, it))]
            else:
                raise ValueError(f"unknown morph op {op!r}")
        return prims

    def _apply_morph(self, canvas, ops: MorphSpec, inside=None):
        """Fused label-map morphology. With `inside` (a bool map of the
        original crop extent within the padded canvas), every primitive
        first replaces out-of-crop pixels with its neutral element (erode:
        255, dilate: 0) — a sliding min/max then ignores them exactly like
        the host path's +/-inf border padding, so the cropped result is
        bit-identical to host morphology on the unpadded map no matter how
        much grid padding the canvas carries."""
        for op, k, it in self._morph_primitives(ops):
            if inside is not None:
                fill = jnp.uint8(255) if op == "erode" else jnp.uint8(0)
                canvas = jnp.where(inside, canvas, fill)
            if op == "erode":
                canvas = morphology.erode(canvas, k, it)
            else:
                canvas = morphology.dilate(canvas, k, it)
        return canvas

    def _is_dual_head_pair(self, other: "SegmentationModel") -> bool:
        """True when `self` (region role) and `other` (textline role) are
        the SAME dual-head flagship model (registry.DUALHEAD_SPEC): one
        shared-trunk forward then yields both label maps."""
        return other is self and bool(self.spec.heads)

    def textline_n_classes(self, other: "SegmentationModel") -> int:
        """Class count of the textline label map a fused dual path emits —
        the last head's width on a dual-head model, else `other`'s full
        class count. Decides 1-bit vs 2-bit packing of the transfer."""
        if self._is_dual_head_pair(other):
            return int(self.spec.heads[-1])
        return int(other.spec.n_classes)

    def _fused_forward_pair(self, other: "SegmentationModel", vars_r,
                            vars_t, tiles, t_tiles, chunk: int):
        """The forward section shared by every fused dual program:
        (region labels, textline labels) uint8 for a (n_pad, mh, mw, 3)
        uint8 tile batch with per-tile Otsu thresholds `t_tiles` (n_pad,).

        Classic pair: the region model sees the otsu_copy binarization
        (all 3 channels = channel 0 thresholded, main.py:191-193) and the
        textline model the raw tiles /255 (main.py:490-503) — two full
        forwards. Dual-head flagship (self is other, spec.heads): ONE
        forward of the shared trunk on the 2-channel input
        [raw01 (channel 0 /255), otsu-binarized] and a per-head argmax —
        halving the fused segmentation FLOPs. Outputs keep the lax.map
        chunk structure; callers reshape via their stitch().
        """
        n_pad, mh, mw = tiles.shape[0], tiles.shape[1], tiles.shape[2]
        mesh = self.mesh
        module_r, module_t = self._module, other._module

        if self._is_dual_head_pair(other):
            h0 = int(self.spec.heads[0])

            def fwd_pair(batch, tb):
                ch0 = jnp.where(
                    batch[..., 0].astype(jnp.int32)
                    > tb[:, None, None].astype(jnp.int32),
                    jnp.float32(1.0), jnp.float32(0.0))
                raw = batch[..., 0].astype(jnp.float32) / 255.0
                x = jnp.stack([raw, ch0], axis=-1)
                logits = module_r.apply(vars_r, x)
                lr = jnp.argmax(logits[..., :h0], axis=-1).astype(jnp.uint8)
                lt = jnp.argmax(logits[..., h0:], axis=-1).astype(jnp.uint8)
                return lr, lt

            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(
                        mesh, PartitionSpec("data", None, None, None)))
                return fwd_pair(tiles, t_tiles)
            chunked = tiles.reshape(n_pad // chunk, chunk, mh, mw, 3)
            t_chunked = t_tiles.reshape(n_pad // chunk, chunk)
            return jax.lax.map(lambda bt: fwd_pair(bt[0], bt[1]),
                               (chunked, t_chunked))

        def fwd_region(batch, tb):
            # otsu_copy semantics per page (main.py:191-193): all 3
            # channels get channel 0's binarization at that page's
            # threshold
            ch0 = jnp.where(
                batch[..., 0].astype(jnp.int32)
                > tb[:, None, None].astype(jnp.int32),
                jnp.float32(1.0), jnp.float32(0.0))
            x = jnp.repeat(ch0[..., None], 3, axis=-1)
            logits = module_r.apply(vars_r, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        def fwd_textline(batch):
            x = batch.astype(jnp.float32) / 255.0
            logits = module_t.apply(vars_t, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(
                    mesh, PartitionSpec("data", None, None, None)))
            return fwd_region(tiles, t_tiles), fwd_textline(tiles)
        chunked = tiles.reshape(n_pad // chunk, chunk, mh, mw, 3)
        t_chunked = t_tiles.reshape(n_pad // chunk, chunk)
        labels_r = jax.lax.map(
            lambda bt: fwd_region(bt[0], bt[1]), (chunked, t_chunked))
        labels_t = jax.lax.map(fwd_textline, chunked)
        return labels_r, labels_t

    def _tiled_fn(self, ny: int, nx: int, margin: int, morph: MorphSpec,
                  pre_otsu: bool, mask_class: Optional[int],
                  post_morph: MorphSpec, example_img: np.ndarray):
        """Build, AOT-compile, and cache the one-dispatch tiled program for
        an (ny, nx) slab grid: [device Otsu] -> tile extract -> chunked
        forward -> slab stitch (a single transpose/reshape — every output
        pixel lies in exactly one tile's central stride x stride slab) ->
        fused label morphology -> [class mask + mask morphology] -> 2-bit
        pack. Returns (compiled, flops); the program's only runtime inputs
        besides the image are the original (h, w) extents, so one compiled
        shape serves every page in the same grid bucket."""
        key = (ny, nx, margin, morph, pre_otsu, mask_class, post_morph)
        entry = self._tiled_cache.get(key)
        if entry is not None:
            return entry

        mh, mw = self.input_hw
        sh, sw = mh - 2 * margin, mw - 2 * margin
        n = ny * nx
        chunk = _balanced_chunk(n, self.runtime.tile_chunk)
        if self.mesh is not None:
            # SPMD: the tile batch shards over the mesh's data axis; the
            # whole padded batch runs as ONE forward (per-device sub-batch
            # = n_pad / n_data tiles), weights replicated over ICI.
            quantum = int(self.mesh.shape["data"])
        else:
            quantum = chunk
        n_pad = ((n + quantum - 1) // quantum) * quantum
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        y0 = np.concatenate([(jj.ravel() * sh), np.zeros(n_pad - n, np.int64)])
        x0 = np.concatenate([(ii.ravel() * sw), np.zeros(n_pad - n, np.int64)])
        module = self._module
        mesh = self.mesh

        def fn(variables, img_u8, ohw):
            if pre_otsu:
                # Reference otsu_copy (main.py:178-194) fused on device. The
                # threshold histogram covers the ORIGINAL (unpadded) page
                # extent — exactly the scope the reference sees — via a
                # runtime weight mask, so the compiled shape is independent
                # of the crop's exact (h, w).
                from sbb_textline_detection_tpu.ops import threshold
                ph, pw = img_u8.shape[:2]
                iy = jnp.arange(ph, dtype=jnp.int32)[:, None]
                ix = jnp.arange(pw, dtype=jnp.int32)[None, :]
                inside = ((iy >= margin) & (iy < margin + ohw[0])
                          & (ix >= margin) & (ix < margin + ohw[1]))
                t = threshold.otsu_threshold_masked(img_u8[..., 0], inside)
                ch0 = jnp.where(img_u8[..., 0].astype(jnp.int32) > t,
                                jnp.uint8(255), jnp.uint8(0))
                img_u8 = jnp.repeat(ch0[..., None], 3, axis=-1)
            y0a = jnp.asarray(y0, jnp.int32)
            x0a = jnp.asarray(x0, jnp.int32)

            def get_tile(yy, xx):
                return jax.lax.dynamic_slice(img_u8, (yy, xx, 0), (mh, mw, 3))

            tiles = jax.vmap(get_tile)(y0a, x0a)          # (n_pad, mh, mw, 3)

            def fwd(batch):
                x = batch.astype(jnp.float32) / 255.0
                logits = module.apply(variables, x)
                return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh,
                                         PartitionSpec("data", None, None,
                                                       None)))
                labels = fwd(tiles)
            else:
                labels = jax.lax.map(
                    fwd, tiles.reshape(n_pad // chunk, chunk, mh, mw, 3))
            labels = labels.reshape(n_pad, mh, mw)[:n]
            slabs = labels[:, margin:margin + sh, margin:margin + sw]
            canvas = (slabs.reshape(ny, nx, sh, sw)
                      .transpose(0, 2, 1, 3)
                      .reshape(ny * sh, nx * sw))
            inside_c = ((jnp.arange(ny * sh, dtype=jnp.int32)[:, None]
                         < ohw[0])
                        & (jnp.arange(nx * sw, dtype=jnp.int32)[None, :]
                           < ohw[1]))
            canvas = self._apply_morph(canvas, morph, inside_c)
            if mask_class is not None:
                # Reference: mask = (labels == class) then OPEN+CLOSE
                # (main.py:457-464) — fused here so only the final binary
                # mask crosses the (slow) device->host path.
                canvas = (canvas == np.uint8(mask_class)).astype(jnp.uint8)
                canvas = self._apply_morph(canvas, post_morph, inside_c)
            return pack_ops.pack2_device(canvas)

        ohw_ex = np.zeros((2,), np.int32)
        entry = self._aot(jax.jit(fn), self.variables, example_img, ohw_ex)
        self._tiled_cache[key] = entry
        return entry

    def predict_tiled(self, img_u8: np.ndarray, margin_ratio: float = 0.1,
                      morph: Optional[MorphSpec] = None,
                      pre_otsu: bool = False,
                      mask_class: Optional[int] = None,
                      post_morph: Optional[MorphSpec] = None) -> np.ndarray:
        """Patch mode (main.py:231-364) in one device dispatch; `morph` ops
        are fused after stitching (reference applies them on the host label
        map, main.py:2074-2075 — same result, no extra round trips). With
        `mask_class`, the label map is reduced to a binary class mask on
        device and `post_morph` ops run on that mask (main.py:457-464);
        the return value is then the 0/1 mask instead of the label map.

        Deviation from the reference grid: the page is padded with `margin`
        of white on the top/left and up to a stride multiple (plus margin)
        on the bottom/right, so each output pixel is covered by exactly one
        tile's central slab — stitching is a reshape instead of the 9-case
        seam trim. The grid is additionally rounded up to `grid_bucket`
        multiples so all similarly-sized pages share one compiled program.
        Interior seams fall at the same stride positions as the reference;
        only tiles touching the page border see white padding instead of
        being shifted inward (main.py:276-281), which perturbs predictions
        only within `margin` of the border. predict_tiled_host is the
        reference-exact oracle."""
        h, w = img_u8.shape[:2]
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        ny, nx = self.grid_for(h, w, margin_ratio)
        img = _pad_white(img_u8, margin, ny * sh - h + margin,
                         margin, nx * sw - w + margin)
        compiled, flops = self._tiled_fn(
            ny, nx, margin, tuple(morph or ()), pre_otsu, mask_class,
            tuple(post_morph or ()), img)
        ohw = np.asarray([h, w], np.int32)
        with stagetime.device_section(flops):
            packed = np.asarray(compiled(self.variables, jnp.asarray(img),
                                         ohw))
        labels = pack_ops.unpack2_host(packed, (ny * sh, nx * sw))
        return labels[:h, :w]

    def predict_dual_tiled(self, other: "SegmentationModel",
                           img_u8: np.ndarray, margin_ratio: float = 0.1,
                           morph: Optional[MorphSpec] = None,
                           mask_class: Optional[int] = None,
                           post_morph: Optional[MorphSpec] = None,
                           return_device_textline: bool = False,
                           textline_projection: bool = False):
        """Run BOTH segmentation passes of the pipeline's crop in ONE
        dispatch: `self` (the region model) sees the device-Otsu-binarized
        tiles (reference otsu_copy + patch predict, main.py:439-454), with
        its label morph / class mask / mask morph fused (main.py:2074-2075,
        457-464); `other` (the textline model) sees the raw tiles
        (main.py:490-503). Tiles are extracted once, the two stitched
        canvases return as one 2-bit-packed buffer — on this serving
        environment's ~20 MB/s device->host path with ~70 ms per-transfer
        latency, halving pads/uploads/dispatches/transfers is worth
        ~1 s/page. Returns (region_mask_01, textline_labels).

        `textline_projection` (requires return_device_textline): the
        textline canvas does NOT cross to host at all — only the region
        canvas is packed, and the host gets the crop-masked row projection
        (int32, what reading order consumes, main.py:1809-1822) plus the
        resident device canvas. Halves the big d2h transfer; the full
        mask stays fetchable from the device handle for fallbacks.
        Returns (region_mask_01, row_projection[:h], textline_dev)."""
        if self.input_hw != other.input_hw:
            raise ValueError("dual tiled predict needs identical geometry")
        if textline_projection and not return_device_textline:
            raise ValueError("textline_projection requires "
                             "return_device_textline")
        h, w = img_u8.shape[:2]
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        ny, nx = self.grid_for(h, w, margin_ratio)
        img = _pad_white(img_u8, margin, ny * sh - h + margin,
                         margin, nx * sw - w + margin)
        # Both canvases are strictly binary when the region map is
        # class-masked and the textline model is 2-class (the flagship
        # config) — 1-bit packing then halves the slow d2h transfer.
        # NOTE: projection mode packs only the (binary) region canvas, so
        # 1-bit packing would be value-correct for >2-class textline
        # bundles too — but switching pack width changes the compiled
        # program, XLA fuses the forward differently, and argmax ties can
        # flip (~0.6% of pixels on noise inputs), breaking the
        # bit-equality contract between projection and classic modes.
        # Keep the pack width a function of the BUNDLE only.
        bits1 = (mask_class is not None
                 and self.textline_n_classes(other) <= 2)
        compiled, flops = self._dual_tiled_fn(
            other, ny, nx, margin, tuple(morph or ()), mask_class,
            tuple(post_morph or ()), img, bits1, return_device_textline,
            textline_projection)
        ohw = np.asarray([h, w], np.int32)
        with stagetime.device_section(flops):
            out = compiled(self.variables, other.variables,
                           jnp.asarray(img), ohw)
            if textline_projection:
                blob_dev, textline_dev = out
                npix = (ny * sh) * (nx * sw)
                packed_nbytes = ((npix + 7) // 8 if bits1
                                 else (npix + 3) // 4)
                blob = np.asarray(blob_dev)
                packed = blob[:packed_nbytes]
                proj = np.frombuffer(blob[packed_nbytes:].tobytes(),
                                     np.int32)
            elif return_device_textline:
                packed_dev, textline_dev = out
                packed = np.asarray(packed_dev)
            else:
                packed_dev, textline_dev = out, None
                packed = np.asarray(packed_dev)
        unpack = pack_ops.unpack1_host if bits1 else pack_ops.unpack2_host
        if textline_projection:
            region = unpack(packed, (ny * sh, nx * sw))
            return region[:h, :w], proj[:h], textline_dev
        both = unpack(packed, (2 * ny * sh, nx * sw))
        if return_device_textline:
            return both[:h, :w], both[ny * sh:ny * sh + h, :w], textline_dev
        return both[:h, :w], both[ny * sh:ny * sh + h, :w]

    def grid_for(self, h: int, w: int, margin_ratio: float = 0.1
                 ) -> Tuple[int, int]:
        """(ny, nx) tile grid this model's tiled paths use for an (h, w)
        image — the grouping key for multi-page fused dispatch (pages in
        one group must share a grid so results stay bit-identical to their
        single-page dispatches). Per-axis buckets: ny rounds to
        runtime.grid_bucket, nx to runtime.grid_bucket_x (a page crop's
        width varies less than its height across a scan batch, so the x
        axis affords a tighter bucket — fewer all-white tiles)."""
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        gb = max(1, self.runtime.grid_bucket)
        gbx = max(1, getattr(self.runtime, "grid_bucket_x", gb))
        ny = -(-max(1, -(-h // sh)) // gb) * gb
        nx = -(-max(1, -(-w // sw)) // gbx) * gbx
        return ny, nx

    def predict_dual_tiled_multi(self, other: "SegmentationModel",
                                 imgs, margin_ratio: float = 0.1,
                                 morph: Optional[MorphSpec] = None,
                                 mask_class: Optional[int] = None,
                                 post_morph: Optional[MorphSpec] = None,
                                 return_device_textline: bool = False,
                                 textline_projection: bool = False):
        """Multi-page fused segmentation: fold K pages' tiles into ONE
        device dispatch (pages x tiles as the forward batch dim, sharded
        over the mesh's data axis when present — the data-parallel-pages
        design of SURVEY §2.4). Per-page Otsu scopes are preserved: each
        page binarizes against its own crop histogram exactly like the
        single-page path. Returns [(region_mask_01, textline_labels), ...]
        in input order, bit-identical to K predict_dual_tiled calls.

        All pages must map to the SAME (ny, nx) grid bucket (grid_for):
        padding a smaller page onto a larger group grid would move the
        canvas border the fused morphology sees and change mask pixels
        near the page edge relative to its single-page dispatch."""
        if self.input_hw != other.input_hw:
            raise ValueError("dual tiled predict needs identical geometry")
        imgs = list(imgs)
        if len(imgs) == 1:
            return [self.predict_dual_tiled(other, imgs[0], margin_ratio,
                                            morph, mask_class, post_morph,
                                            return_device_textline,
                                            textline_projection)]
        if textline_projection and not return_device_textline:
            raise ValueError("textline_projection requires "
                             "return_device_textline")
        k = len(imgs)
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        grids = {self.grid_for(im.shape[0], im.shape[1], margin_ratio)
                 for im in imgs}
        if len(grids) != 1:
            raise ValueError(
                f"pages span multiple tile grids {sorted(grids)}; group "
                "pages by grid_for() before fusing")
        ny, nx = grids.pop()
        stacked = np.stack([
            _pad_white(im, margin, ny * sh - im.shape[0] + margin,
                       margin, nx * sw - im.shape[1] + margin)
            for im in imgs])
        # NOTE: projection mode packs only the (binary) region canvas, so
        # 1-bit packing would be value-correct for >2-class textline
        # bundles too — but switching pack width changes the compiled
        # program, XLA fuses the forward differently, and argmax ties can
        # flip (~0.6% of pixels on noise inputs), breaking the
        # bit-equality contract between projection and classic modes.
        # Keep the pack width a function of the BUNDLE only.
        bits1 = (mask_class is not None
                 and self.textline_n_classes(other) <= 2)
        compiled, flops = self._dual_tiled_multi_fn(
            other, k, ny, nx, margin, tuple(morph or ()), mask_class,
            tuple(post_morph or ()), stacked, bits1,
            return_device_textline, textline_projection)
        ohw = np.asarray([[im.shape[0], im.shape[1]] for im in imgs],
                         np.int32)
        projs = None
        with stagetime.device_section(flops):
            res = compiled(self.variables, other.variables,
                           jnp.asarray(stacked), ohw)
            if textline_projection:
                npix = k * (ny * sh) * (nx * sw)
                packed, projs, textline_stack = self._split_dual_outputs(
                    res, return_device_textline, True,
                    (npix + 7) // 8 if bits1 else (npix + 3) // 4,
                    (k, ny * sh))
            elif return_device_textline:
                packed_dev, textline_stack = res
                packed = np.asarray(packed_dev)
            else:
                packed_dev, textline_stack = res, None
                packed = np.asarray(packed_dev)
        big_h = ny * sh
        unpack = pack_ops.unpack1_host if bits1 else pack_ops.unpack2_host
        rows = k * big_h if textline_projection else 2 * k * big_h
        both = unpack(packed, (rows, nx * sw))
        out = []
        for i, im in enumerate(imgs):
            h, w = im.shape[:2]
            region = both[i * big_h:i * big_h + h, :w]
            if textline_projection:
                out.append((region, projs[i, :h], textline_stack[i]))
                continue
            textline = both[(k + i) * big_h:(k + i) * big_h + h, :w]
            if return_device_textline:
                out.append((region, textline, textline_stack[i]))
            else:
                out.append((region, textline))
        return out

    # -- resident-image path ------------------------------------------------
    def canvas_shape_for(self, scaled_h: int, scaled_w: int,
                         margin_ratio: float = 0.1) -> Tuple[int, int]:
        """Static canvas shape for the resident-image path: the scaled page
        plus `margin` context on the top/left, one tile stride + margin of
        slack on the bottom/right (so every tile whose slab contains real
        crop pixels stays in bounds — fully-out-of-crop tiles may be
        clamped by dynamic_slice onto white rows, which is exactly what
        they'd read anyway), rounded up to 128 so nearby page sizes share
        one compiled program."""
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        ch = margin + scaled_h + sh + margin
        cw = margin + scaled_w + sw + margin
        return (-(-ch // 128) * 128, -(-cw // 128) * 128)

    def upload_raw(self, image: np.ndarray):
        """Pad the ORIGINAL page to 128-multiples (white) and START its
        host->device transfer. The working-resolution canvas is then
        materialized ON DEVICE by predict_dual_tiled_resident_raw (exact
        INTER_NEAREST index maps), so the host never resizes the ~10 MP
        page (reference main.py:196-214 does it on the host) and the
        upload carries the raw bytes — ~30%% smaller than the resized
        working canvas.

        `image` may be (h, w, 3) RGB or a single (h, w) gray plane: when a
        scan's three channels are byte-identical (detector checks), one
        plane carries the same information at a third of the (blocking,
        ~130 MB/s) host->device bytes; the device program re-broadcasts to
        the models' 3-channel input, so results are bit-identical."""
        h, w = image.shape[:2]
        ph = -(-h // 128) * 128
        pw = -(-w // 128) * 128
        if (ph, pw) != (h, w):
            image = _pad_white(image, 0, ph - h, 0, pw - w)
        return jax.device_put(image)

    def predict_dual_tiled_resident_raw(self, other: "SegmentationModel",
                                        raws, boxes, scaled_hws,
                                        margin_ratio: float = 0.1,
                                        morph: Optional[MorphSpec] = None,
                                        mask_class: Optional[int] = None,
                                        post_morph: Optional[MorphSpec] = None,
                                        return_device_textline: bool = False,
                                        raw_hws=None,
                                        textline_projection: bool = False,
                                        defer_fetch: bool = False):
        """predict_dual_tiled_resident reading from RESIDENT *raw* pages
        (upload_raw): the program's first step gathers the margin-padded
        working canvas out of each raw page through per-axis nearest index
        maps computed host-side with the exact resize semantics of
        stages.scale_image (main.py:196-214), then proceeds identically.
        `scaled_hws`: per page (target_h, target_w) working dims — must
        all be equal (they set the canvas shape); `boxes` as in the
        resident path, in working coordinates; `raw_hws`: the ORIGINAL
        page dims before upload_raw's 128-multiple padding (the resize
        index maps must use these — defaults to the padded array dims,
        correct only for pages already at 128 multiples)."""
        if self.input_hw != other.input_hw:
            raise ValueError("dual tiled predict needs identical geometry")
        k = len(raws)
        boxes = np.asarray(boxes, np.int32).reshape(k, 4)
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        if len({tuple(s) for s in scaled_hws}) != 1:
            raise ValueError("pages span multiple working sizes; group "
                             "before fusing")
        th, tw = scaled_hws[0]
        grids = {self.grid_for(int(b[2]), int(b[3]), margin_ratio)
                 for b in boxes}
        if len(grids) != 1:
            raise ValueError(
                f"pages span multiple tile grids {sorted(grids)}; group "
                "pages by grid_for() before fusing")
        ny, nx = grids.pop()
        shapes = {tuple(r.shape) for r in raws}
        if len(shapes) != 1:
            raise ValueError(f"raw shapes differ: {sorted(shapes)}")
        ch, cw = self.canvas_shape_for(th, tw, margin_ratio)
        if raw_hws is None:
            raw_hws = [tuple(r.shape[:2]) for r in raws]
        if len({tuple(s) for s in raw_hws}) != 1:
            raise ValueError("pages span multiple raw sizes; group first")
        raw_h, raw_w = raw_hws[0]
        # canvas row i -> raw row (or -1 = white): margin offset baked in
        iy = np.full(ch, -1, np.int32)
        ix = np.full(cw, -1, np.int32)
        iy[margin:margin + th] = resize_ops._nearest_indices(th, raw_h)
        ix[margin:margin + tw] = resize_ops._nearest_indices(tw, raw_w)
        iy_all = np.broadcast_to(iy, (k, ch)).copy()
        ix_all = np.broadcast_to(ix, (k, cw)).copy()
        stacked = jnp.stack(raws)
        # NOTE: projection mode packs only the (binary) region canvas, so
        # 1-bit packing would be value-correct for >2-class textline
        # bundles too — but switching pack width changes the compiled
        # program, XLA fuses the forward differently, and argmax ties can
        # flip (~0.6% of pixels on noise inputs), breaking the
        # bit-equality contract between projection and classic modes.
        # Keep the pack width a function of the BUNDLE only.
        bits1 = (mask_class is not None
                 and self.textline_n_classes(other) <= 2)
        if textline_projection and not return_device_textline:
            raise ValueError("textline_projection requires "
                             "return_device_textline")
        compiled, flops = self._dual_tiled_resident_fn(
            other, k, ny, nx, margin, (k, ch, cw, 3),
            tuple(morph or ()), mask_class, tuple(post_morph or ()), bits1,
            return_device_textline, raw_shape=tuple(stacked.shape),
            proj=textline_projection)
        npix = k * (ny * sh) * (nx * sw)
        packed_nbytes = (npix + 7) // 8 if bits1 else (npix + 3) // 4
        if defer_fetch:
            # dispatch now, fetch later (DeferredFusedRaw.fetch): the
            # caller can enqueue programs that READ this program's
            # on-device outputs (the speculative deskew) before blocking
            # on the blob transfer. k == 1 (the production raw path).
            if k != 1:
                raise ValueError("defer_fetch is single-page only")
            t0 = _time.time()
            res = compiled(self.variables, other.variables, stacked, boxes,
                           jnp.asarray(iy_all), jnp.asarray(ix_all))
            stagetime.add(_time.time() - t0, 0.0)
            return DeferredFusedRaw(res, boxes, ny, nx, sh, sw, bits1,
                                    return_device_textline,
                                    textline_projection, packed_nbytes,
                                    flops)
        with stagetime.device_section(flops):
            res = compiled(self.variables, other.variables, stacked, boxes,
                           jnp.asarray(iy_all), jnp.asarray(ix_all))
            res = self._split_dual_outputs(
                res, return_device_textline, textline_projection,
                packed_nbytes, (k, ny * sh))
            packed, projs, textline_stack = res
        return self._unpack_dual_pages(packed, projs, textline_stack,
                                       boxes, ny, nx, sh, sw, bits1,
                                       return_device_textline,
                                       textline_projection)

    def predict_dual_tiled_resident_raw_headless(
            self, other: "SegmentationModel", raw, boxes5_dev,
            scaled_hw, margin_ratio: float = 0.1,
            morph: Optional[MorphSpec] = None,
            mask_class: Optional[int] = None,
            post_morph: Optional[MorphSpec] = None,
            raw_hw=None):
        """predict_dual_tiled_resident_raw with the page box as a DEVICE
        input (page_box_dev's (1, 5) result) instead of host ints: the
        host never fetches the page-model output, so the device phase is
        upload -> box dispatch -> fused dispatch -> ONE blob fetch. The
        tile grid covers the full working page (the box is unknown at
        dispatch time); runtime box masking keeps results identical to the
        box-sized grid, at the price of the trimmed margin tiles. The box
        bytes ride at the tail of the packed blob.

        Single-page only (the production dispatch shape). Requires
        mask_class (1-bit packing) and always returns the device textline
        handle + row projection. Returns (region_mask, row_projection,
        textline_dev, box5) with box5 the fetched [by, bx, h, w, valid]."""
        if self.input_hw != other.input_hw:
            raise ValueError("dual tiled predict needs identical geometry")
        if mask_class is None:
            raise ValueError("headless path requires mask_class")
        if tuple(boxes5_dev.shape) != (1, 5):
            raise ValueError(f"boxes5_dev must be (1, 5), got "
                             f"{tuple(boxes5_dev.shape)}")
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        th, tw = scaled_hw
        ny, nx = self.grid_for(th, tw, margin_ratio)
        ch, cw = self.canvas_shape_for(th, tw, margin_ratio)
        if raw_hw is None:
            raw_hw = tuple(raw.shape[:2])
        raw_h, raw_w = raw_hw
        iy = np.full(ch, -1, np.int32)
        ix = np.full(cw, -1, np.int32)
        iy[margin:margin + th] = resize_ops._nearest_indices(th, raw_h)
        ix[margin:margin + tw] = resize_ops._nearest_indices(tw, raw_w)
        stacked = raw[None] if raw.ndim in (2, 3) else raw
        bits1 = self.textline_n_classes(other) <= 2
        compiled, flops = self._dual_tiled_resident_fn(
            other, 1, ny, nx, margin, (1, ch, cw, 3),
            tuple(morph or ()), mask_class, tuple(post_morph or ()),
            bits1=bits1, keep_dev=True,
            raw_shape=tuple(stacked.shape), proj=True, box_blob=True)
        big_h, big_w = ny * sh, nx * sw
        npix = big_h * big_w
        packed_nbytes = (npix + 7) // 8 if bits1 else (npix + 3) // 4
        proj_nbytes = big_h * 4
        with stagetime.device_section(flops):
            blob_dev, textline_stack = compiled(
                self.variables, other.variables, stacked, boxes5_dev,
                jnp.asarray(iy[None]), jnp.asarray(ix[None]))
            blob = np.asarray(blob_dev)      # the single d2h round trip
        packed = blob[:packed_nbytes]
        proj = np.frombuffer(
            blob[packed_nbytes:packed_nbytes + proj_nbytes].tobytes(),
            np.int32)
        box5 = np.frombuffer(
            blob[packed_nbytes + proj_nbytes:].tobytes(),
            np.int32).reshape(5)
        h, w = int(box5[2]), int(box5[3])
        unpack = pack_ops.unpack1_host if bits1 else pack_ops.unpack2_host
        region = unpack(packed, (big_h, big_w))[:h, :w]
        return region, proj[:h], textline_stack[0], box5

    def predict_dual_tiled_resident_raw_fullfused(
            self, other: "SegmentationModel", page: "SegmentationModel",
            raw, small_ys, small_xs, scaled_hw, margin_ratio: float = 0.1,
            morph: Optional[MorphSpec] = None,
            mask_class: Optional[int] = None,
            post_morph: Optional[MorphSpec] = None,
            raw_hw=None):
        """The whole page device phase as ONE program: the page model's
        input is gathered from the RESIDENT raw page on device
        (`small_ys`/`small_xs` = composed two-stage nearest index maps,
        ops/resize.compose_nearest_indices), the page forward + border-box
        decision run inline (_page_box_from_small), and the box feeds the
        fused dual segmentation directly. Chain: raw upload -> ONE
        dispatch -> ONE blob fetch — one dispatch round trip and the
        host-side small gather + upload shorter than the headless path
        (page_box_dev + fused dispatch). Everything else (grid, packing,
        blob layout) matches predict_dual_tiled_resident_raw_headless.

        Single-page only. Returns (region_mask, row_projection,
        textline_dev, box5) with box5 the fetched [by, bx, h, w, valid]."""
        if self.input_hw != other.input_hw:
            raise ValueError("dual tiled predict needs identical geometry")
        if mask_class is None:
            raise ValueError("fullfused path requires mask_class")
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        th, tw = scaled_hw
        ny, nx = self.grid_for(th, tw, margin_ratio)
        ch, cw = self.canvas_shape_for(th, tw, margin_ratio)
        if raw_hw is None:
            raw_hw = tuple(raw.shape[:2])
        raw_h, raw_w = raw_hw
        pmh, pmw = page.input_hw
        small_ys = np.asarray(small_ys, np.int32).reshape(pmh)
        small_xs = np.asarray(small_xs, np.int32).reshape(pmw)
        iy = np.full(ch, -1, np.int32)
        ix = np.full(cw, -1, np.int32)
        iy[margin:margin + th] = resize_ops._nearest_indices(th, raw_h)
        ix[margin:margin + tw] = resize_ops._nearest_indices(tw, raw_w)
        stacked = raw[None] if raw.ndim in (2, 3) else raw
        bits1 = self.textline_n_classes(other) <= 2
        compiled, flops = self._dual_tiled_resident_fn(
            other, 1, ny, nx, margin, (1, ch, cw, 3),
            tuple(morph or ()), mask_class, tuple(post_morph or ()),
            bits1=bits1, keep_dev=True,
            raw_shape=tuple(stacked.shape), proj=True, box_blob=True,
            page_box=(page, th, tw))
        big_h, big_w = ny * sh, nx * sw
        npix = big_h * big_w
        packed_nbytes = (npix + 7) // 8 if bits1 else (npix + 3) // 4
        proj_nbytes = big_h * 4
        with stagetime.device_section(flops):
            blob_dev, textline_stack = compiled(
                self.variables, other.variables, page.variables, stacked,
                jnp.asarray(iy[None]), jnp.asarray(ix[None]),
                jnp.asarray(small_ys), jnp.asarray(small_xs))
            blob = np.asarray(blob_dev)      # the single d2h round trip
        packed = blob[:packed_nbytes]
        proj = np.frombuffer(
            blob[packed_nbytes:packed_nbytes + proj_nbytes].tobytes(),
            np.int32)
        box5 = np.frombuffer(
            blob[packed_nbytes + proj_nbytes:].tobytes(),
            np.int32).reshape(5)
        h, w = int(box5[2]), int(box5[3])
        unpack = pack_ops.unpack1_host if bits1 else pack_ops.unpack2_host
        region = unpack(packed, (big_h, big_w))[:h, :w]
        return region, proj[:h], textline_stack[0], box5

    def upload_canvas(self, scaled_img: np.ndarray,
                      margin_ratio: float = 0.1):
        """Host-pad the working page into its white canvas and ship it
        (jax.device_put — NOTE: BLOCKS on this serving transport at
        ~130 MB/s, and transfers/programs execute in device order, so the
        upload cannot hide behind a running program; doing it first is a
        dispatch-ORDER choice: the fused program then reads a RESIDENT
        canvas instead of re-uploading the crop before its dispatch).
        Returns the device array for predict_dual_tiled_resident."""
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        ch, cw = self.canvas_shape_for(scaled_img.shape[0],
                                       scaled_img.shape[1], margin_ratio)
        h, w = scaled_img.shape[:2]
        canvas = _pad_white(scaled_img, margin, ch - h - margin,
                            margin, cw - w - margin)
        return jax.device_put(canvas)

    def predict_dual_tiled_resident(self, other: "SegmentationModel",
                                    canvases, boxes,
                                    margin_ratio: float = 0.1,
                                    morph: Optional[MorphSpec] = None,
                                    mask_class: Optional[int] = None,
                                    post_morph: Optional[MorphSpec] = None,
                                    return_device_textline: bool = False,
                                    textline_projection: bool = False):
        """Fused dual segmentation reading the page crops out of RESIDENT
        margin-padded canvases (upload_canvas) with runtime box offsets —
        no second full-page upload on the critical path. `canvases`: list
        of K device arrays of IDENTICAL canvas shape; `boxes`: per page
        [by, bx, crop_h, crop_w] in scaled-image coordinates. Bit-identical
        to predict_dual_tiled on the cropped page: tiles read white outside
        the crop box exactly like the padded-crop upload, and the Otsu
        histogram covers the same crop pixels
        (tests/test_runner_resident.py). Returns [(region_mask,
        textline_labels), ...]."""
        if self.input_hw != other.input_hw:
            raise ValueError("dual tiled predict needs identical geometry")
        k = len(canvases)
        boxes = np.asarray(boxes, np.int32).reshape(k, 4)
        mh, mw = self.input_hw
        margin = int(margin_ratio * mw)
        sh, sw = mh - 2 * margin, mw - 2 * margin
        grids = {self.grid_for(int(b[2]), int(b[3]), margin_ratio)
                 for b in boxes}
        if len(grids) != 1:
            raise ValueError(
                f"pages span multiple tile grids {sorted(grids)}; group "
                "pages by grid_for() before fusing")
        ny, nx = grids.pop()
        shapes = {tuple(c.shape) for c in canvases}
        if len(shapes) != 1:
            raise ValueError(f"canvas shapes differ: {sorted(shapes)}")
        stacked = jnp.stack(canvases)
        # NOTE: projection mode packs only the (binary) region canvas, so
        # 1-bit packing would be value-correct for >2-class textline
        # bundles too — but switching pack width changes the compiled
        # program, XLA fuses the forward differently, and argmax ties can
        # flip (~0.6% of pixels on noise inputs), breaking the
        # bit-equality contract between projection and classic modes.
        # Keep the pack width a function of the BUNDLE only.
        bits1 = (mask_class is not None
                 and self.textline_n_classes(other) <= 2)
        if textline_projection and not return_device_textline:
            raise ValueError("textline_projection requires "
                             "return_device_textline")
        compiled, flops = self._dual_tiled_resident_fn(
            other, k, ny, nx, margin, tuple(stacked.shape),
            tuple(morph or ()), mask_class, tuple(post_morph or ()), bits1,
            return_device_textline, proj=textline_projection)
        with stagetime.device_section(flops):
            res = compiled(self.variables, other.variables, stacked, boxes)
            npix = k * (ny * sh) * (nx * sw)
            res = self._split_dual_outputs(
                res, return_device_textline, textline_projection,
                (npix + 7) // 8 if bits1 else (npix + 3) // 4,
                (k, ny * sh))
            packed, projs, textline_stack = res
        return self._unpack_dual_pages(packed, projs, textline_stack,
                                       boxes, ny, nx, sh, sw, bits1,
                                       return_device_textline,
                                       textline_projection)

    @staticmethod
    def _split_dual_outputs(res, keep_dev: bool, proj: bool,
                            packed_nbytes: int = 0, proj_shape=None):
        """(packed_np, projs_np, textline_stack) from a fused program's
        raw outputs; the packed fetch blocks here. In projection mode the
        single blob carries [packed region bytes | int32 projection
        bytes] (one d2h round trip)."""
        if proj:
            blob_dev, textline_stack = res
            blob = np.asarray(blob_dev)
            packed = blob[:packed_nbytes]
            projs = np.frombuffer(
                blob[packed_nbytes:].tobytes(), np.int32).reshape(
                    proj_shape)
            return packed, projs, textline_stack
        if keep_dev:
            packed_dev, textline_stack = res
            return np.asarray(packed_dev), None, textline_stack
        return np.asarray(res), None, None

    @staticmethod
    def _unpack_dual_pages(packed, projs, textline_stack, boxes, ny, nx,
                           sh, sw, bits1, keep_dev: bool, proj: bool):
        """Per-page (region, textline-or-projection[, device handle])
        tuples from the packed transfer of a K-page fused program."""
        k = len(boxes)
        big_h = ny * sh
        unpack = pack_ops.unpack1_host if bits1 else pack_ops.unpack2_host
        rows = k * big_h if proj else 2 * k * big_h
        both = unpack(packed, (rows, nx * sw))
        out = []
        for i, b in enumerate(boxes):
            h, w = int(b[2]), int(b[3])
            region = both[i * big_h:i * big_h + h, :w]
            if proj:
                out.append((region, projs[i, :h], textline_stack[i]))
                continue
            textline = both[(k + i) * big_h:(k + i) * big_h + h, :w]
            if keep_dev:
                out.append((region, textline, textline_stack[i]))
            else:
                out.append((region, textline))
        return out

    @_serialize_compiles
    def _dual_tiled_resident_fn(self, other: "SegmentationModel", k: int,
                                ny: int, nx: int, margin: int,
                                stacked_shape, morph: MorphSpec,
                                mask_class: Optional[int],
                                post_morph: MorphSpec, bits1: bool,
                                keep_dev: bool = False,
                                raw_shape=None, proj: bool = False,
                                box_blob: bool = False,
                                page_box=None):
        """`stacked_shape` is the (k, ch, cw, 3) canvas shape. With
        `raw_shape` set, the program's inputs are raw pages of that shape
        plus per-axis nearest index maps, and the canvas is gathered on
        device (the raw-upload path). With `proj`, only the region canvas
        is packed and the textline canvas crosses as its crop-masked row
        projection (+ the resident device handle). With `box_blob` (the
        headless page-box path), the boxes input is (k, 5) int32
        [by, bx, h, w, valid] — typically a DEVICE result of page_box_dev,
        never fetched by the host — and its bytes ride at the tail of the
        packed blob so the host learns the box from the same single
        fetch. With `page_box` = (page_model, th, tw) (implies box_blob,
        raw_shape, k == 1), there is no boxes input at all: the program
        gathers the page model's small input from the raw page (index-map
        inputs), runs the page forward + box decision inline
        (_page_box_from_small with STATIC working dims), and feeds the box
        straight into the segmentation — the whole page device phase as
        one dispatch."""
        key = ("dual_res", id(other), k, ny, nx, margin, stacked_shape,
               morph, mask_class, post_morph, bits1, keep_dev, raw_shape,
               proj, box_blob,
               (id(page_box[0]), page_box[1], page_box[2])
               if page_box is not None else None)
        entry = self._tiled_cache.get(key)
        if entry is not None:
            return entry
        if page_box is not None and (raw_shape is None or not box_blob
                                     or k != 1):
            raise ValueError("page_box requires raw_shape, box_blob, k=1")

        mh, mw = self.input_hw
        sh, sw = mh - 2 * margin, mw - 2 * margin
        n = ny * nx
        total = k * n
        chunk = _balanced_chunk(total, self.runtime.tile_chunk)
        quantum = (int(self.mesh.shape["data"]) if self.mesh is not None
                   else chunk)
        n_pad = ((total + quantum - 1) // quantum) * quantum
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        jjr = jj.ravel() * sh
        iir = ii.ravel() * sw

        def stitch(labels):
            labels = labels.reshape(n_pad, mh, mw)[:total]
            slabs = labels[:, margin:margin + sh, margin:margin + sw]
            return (slabs.reshape(k, ny, nx, sh, sw)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(k, ny * sh, nx * sw))

        ch_, cw_ = stacked_shape[1], stacked_shape[2]

        def _core(vars_r, vars_t, canvases_u8, boxes_in):
            from sbb_textline_detection_tpu.ops import threshold
            boxes = boxes_in[:, :4] if box_blob else boxes_in
            ph, pw = canvases_u8.shape[1:3]
            iy = jnp.arange(ph, dtype=jnp.int32)[:, None]
            ix = jnp.arange(pw, dtype=jnp.int32)[None, :]

            def whiten(img, box):
                by, bx, hh, ww_ = box[0], box[1], box[2], box[3]
                inside = ((iy >= margin + by) & (iy < margin + by + hh)
                          & (ix >= margin + bx) & (ix < margin + bx + ww_))
                return jnp.where(inside[..., None], img, jnp.uint8(255))

            imgs = jax.vmap(whiten)(canvases_u8, boxes)     # (k, ph, pw, 3)

            def page_thresh(img, box):
                by, bx, hh, ww_ = box[0], box[1], box[2], box[3]
                inside = ((iy >= margin + by) & (iy < margin + by + hh)
                          & (ix >= margin + bx) & (ix < margin + bx + ww_))
                return threshold.otsu_threshold_masked(img[..., 0], inside)

            ts = jax.vmap(page_thresh)(imgs, boxes)          # (k,)

            jja = jnp.asarray(jjr, jnp.int32)
            iia = jnp.asarray(iir, jnp.int32)

            def page_tiles(img, box):
                return jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                    img, (box[0] + yy, box[1] + xx, 0), (mh, mw, 3)))(
                        jja, iia)

            tiles = jax.vmap(page_tiles)(imgs, boxes)        # (k,n,mh,mw,3)
            tiles = tiles.reshape(total, mh, mw, 3)
            t_tiles = jnp.repeat(ts, n)
            if n_pad > total:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((n_pad - total, mh, mw, 3),
                                      tiles.dtype)], axis=0)
                t_tiles = jnp.concatenate(
                    [t_tiles, jnp.zeros((n_pad - total,), t_tiles.dtype)])

            labels_r, labels_t = self._fused_forward_pair(
                other, vars_r, vars_t, tiles, t_tiles, chunk)
            canvas_r = stitch(labels_r)
            canvas_t = stitch(labels_t)

            def shape_page(c, box):
                ins = ((jnp.arange(ny * sh, dtype=jnp.int32)[:, None]
                        < box[2])
                       & (jnp.arange(nx * sw, dtype=jnp.int32)[None, :]
                          < box[3]))
                c = self._apply_morph(c, morph, ins)
                if mask_class is not None:
                    c = (c == np.uint8(mask_class)).astype(jnp.uint8)
                    c = self._apply_morph(c, post_morph, ins)
                return c

            canvas_r = jax.vmap(shape_page)(canvas_r, boxes)
            big_h, big_w = ny * sh, nx * sw
            pack = pack_ops.pack1_device if bits1 else pack_ops.pack2_device
            if proj:
                cols = jnp.arange(big_w, dtype=jnp.int32)[None, :]
                rowsum = jax.vmap(lambda c, box: jnp.sum(
                    jnp.where(cols < box[3], c, jnp.uint8(0)).astype(
                        jnp.int32), axis=1))(canvas_t, boxes)
                parts = [pack(canvas_r.reshape(k * big_h, big_w)),
                         jax.lax.bitcast_convert_type(
                             rowsum, jnp.uint8).reshape(-1)]
                if box_blob:
                    parts.append(jax.lax.bitcast_convert_type(
                        boxes_in, jnp.uint8).reshape(-1))
                blob = jnp.concatenate(parts)
                return blob, canvas_t
            packed = pack(jnp.concatenate(
                [canvas_r.reshape(k * big_h, big_w),
                 canvas_t.reshape(k * big_h, big_w)], axis=0))
            if keep_dev:
                return packed, canvas_t
            return packed

        boxes_ex = jax.ShapeDtypeStruct((k, 5 if box_blob else 4),
                                        jnp.int32)
        if raw_shape is None:
            canv_ex = jax.ShapeDtypeStruct(stacked_shape, jnp.uint8)
            entry = self._aot(jax.jit(_core), self.variables,
                              other.variables, canv_ex, boxes_ex)
        else:
            raw_h, raw_w = raw_shape[1], raw_shape[2]
            gray = len(raw_shape) == 3  # (k, h, w) single-plane pages

            def fn_raw(vars_r, vars_t, raws_u8, boxes, iy_map, ix_map):
                def build_canvas(raw, iyb, ixb):
                    # device-side exact INTER_NEAREST: rows then cols;
                    # -1 entries (margin/slack) gather clipped junk that
                    # the mask immediately whitens
                    rows = jnp.take(raw, jnp.clip(iyb, 0, raw_h - 1),
                                    axis=0)
                    cv = jnp.take(rows, jnp.clip(ixb, 0, raw_w - 1),
                                  axis=1)
                    ok = (iyb[:, None] >= 0) & (ixb[None, :] >= 0)
                    if gray:
                        cv = cv[..., None]
                    return jnp.where(ok[..., None], cv, jnp.uint8(255))

                canvases = jax.vmap(build_canvas)(raws_u8, iy_map, ix_map)
                if gray:
                    # broadcast the plane back to the models' 3-channel
                    # input; XLA fuses this into the tile gather, so the
                    # triple never materializes page-sized in HBM
                    canvases = jnp.broadcast_to(
                        canvases, canvases.shape[:3] + (3,))
                return _core(vars_r, vars_t, canvases, boxes)

            raw_ex = jax.ShapeDtypeStruct(raw_shape, jnp.uint8)
            iy_ex = jax.ShapeDtypeStruct((k, ch_), jnp.int32)
            ix_ex = jax.ShapeDtypeStruct((k, cw_), jnp.int32)
            if page_box is not None:
                page_model, th_s, tw_s = page_box
                pmh, pmw = page_model.input_hw

                def fn_full(vars_r, vars_t, vars_p, raws_u8, iy_map,
                            ix_map, sy, sx):
                    raw0 = raws_u8[0]
                    rows = jnp.take(raw0, sy, axis=0)
                    small = jnp.take(rows, sx, axis=1)
                    if gray:
                        small = small[..., None]
                    small3 = jnp.broadcast_to(small,
                                              small.shape[:2] + (3,))
                    box5 = _page_box_from_small(
                        page_model._module, vars_p, small3, th_s, tw_s)
                    return fn_raw(vars_r, vars_t, raws_u8, box5, iy_map,
                                  ix_map)

                sy_ex = jax.ShapeDtypeStruct((pmh,), jnp.int32)
                sx_ex = jax.ShapeDtypeStruct((pmw,), jnp.int32)
                entry = self._aot(jax.jit(fn_full), self.variables,
                                  other.variables, page_model.variables,
                                  raw_ex, iy_ex, ix_ex, sy_ex, sx_ex)
            else:
                entry = self._aot(jax.jit(fn_raw), self.variables,
                                  other.variables, raw_ex, boxes_ex, iy_ex,
                                  ix_ex)
        self._tiled_cache[key] = entry
        return entry

    @_serialize_compiles
    def _dual_tiled_multi_fn(self, other: "SegmentationModel", k: int,
                             ny: int, nx: int, margin: int, morph: MorphSpec,
                             mask_class: Optional[int],
                             post_morph: MorphSpec, example_imgs: np.ndarray,
                             bits1: bool = False, keep_dev: bool = False,
                             proj: bool = False):
        key = ("dual_multi", id(other), k, ny, nx, margin, morph, mask_class,
               post_morph, bits1, keep_dev, proj)
        entry = self._tiled_cache.get(key)
        if entry is not None:
            return entry

        mh, mw = self.input_hw
        sh, sw = mh - 2 * margin, mw - 2 * margin
        n = ny * nx
        total = k * n
        chunk = _balanced_chunk(total, self.runtime.tile_chunk)
        quantum = (int(self.mesh.shape["data"]) if self.mesh is not None
                   else chunk)
        n_pad = ((total + quantum - 1) // quantum) * quantum
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        y0 = jj.ravel() * sh
        x0 = ii.ravel() * sw

        def stitch(labels):
            labels = labels.reshape(n_pad, mh, mw)[:total]
            slabs = labels[:, margin:margin + sh, margin:margin + sw]
            return (slabs.reshape(k, ny, nx, sh, sw)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(k, ny * sh, nx * sw))

        def fn(vars_r, vars_t, imgs_u8, ohw):
            from sbb_textline_detection_tpu.ops import threshold
            ph, pw = imgs_u8.shape[1:3]
            iy = jnp.arange(ph, dtype=jnp.int32)[:, None]
            ix = jnp.arange(pw, dtype=jnp.int32)[None, :]

            def page_thresh(img, hw):
                inside = ((iy >= margin) & (iy < margin + hw[0])
                          & (ix >= margin) & (ix < margin + hw[1]))
                return threshold.otsu_threshold_masked(img[..., 0], inside)

            ts = jax.vmap(page_thresh)(imgs_u8, ohw)          # (k,)

            y0a = jnp.asarray(y0, jnp.int32)
            x0a = jnp.asarray(x0, jnp.int32)

            def page_tiles(img):
                return jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(
                    img, (yy, xx, 0), (mh, mw, 3)))(y0a, x0a)

            tiles = jax.vmap(page_tiles)(imgs_u8)             # (k,n,mh,mw,3)
            tiles = tiles.reshape(total, mh, mw, 3)
            t_tiles = jnp.repeat(ts, n)                       # (total,)
            if n_pad > total:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((n_pad - total, mh, mw, 3),
                                      tiles.dtype)], axis=0)
                t_tiles = jnp.concatenate(
                    [t_tiles, jnp.zeros((n_pad - total,), t_tiles.dtype)])

            labels_r, labels_t = self._fused_forward_pair(
                other, vars_r, vars_t, tiles, t_tiles, chunk)
            canvas_r = stitch(labels_r)                       # (k, H, W)
            canvas_t = stitch(labels_t)

            def shape_page(c, hw):
                ins = ((jnp.arange(ny * sh, dtype=jnp.int32)[:, None]
                        < hw[0])
                       & (jnp.arange(nx * sw, dtype=jnp.int32)[None, :]
                          < hw[1]))
                c = self._apply_morph(c, morph, ins)
                if mask_class is not None:
                    c = (c == np.uint8(mask_class)).astype(jnp.uint8)
                    c = self._apply_morph(c, post_morph, ins)
                return c

            canvas_r = jax.vmap(shape_page)(canvas_r, ohw)
            big_h, big_w = ny * sh, nx * sw
            pack = pack_ops.pack1_device if bits1 else pack_ops.pack2_device
            if proj:
                cols = jnp.arange(big_w, dtype=jnp.int32)[None, :]
                rowsum = jax.vmap(lambda c, hw: jnp.sum(
                    jnp.where(cols < hw[1], c, jnp.uint8(0)).astype(
                        jnp.int32), axis=1))(canvas_t, ohw)
                blob = jnp.concatenate(
                    [pack(canvas_r.reshape(k * big_h, big_w)),
                     jax.lax.bitcast_convert_type(
                         rowsum, jnp.uint8).reshape(-1)])
                return blob, canvas_t
            packed = pack(jnp.concatenate(
                [canvas_r.reshape(k * big_h, big_w),
                 canvas_t.reshape(k * big_h, big_w)], axis=0))
            if keep_dev:
                return packed, canvas_t
            return packed

        ohw_ex = np.zeros((k, 2), np.int32)
        entry = self._aot(jax.jit(fn), self.variables, other.variables,
                          example_imgs, ohw_ex)
        self._tiled_cache[key] = entry
        return entry

    @_serialize_compiles
    def _dual_tiled_fn(self, other: "SegmentationModel", ny: int, nx: int,
                       margin: int, morph: MorphSpec,
                       mask_class: Optional[int], post_morph: MorphSpec,
                       example_img: np.ndarray, bits1: bool = False,
                       keep_dev: bool = False, proj: bool = False):
        key = ("dual", id(other), ny, nx, margin, morph, mask_class,
               post_morph, bits1, keep_dev, proj)
        entry = self._tiled_cache.get(key)
        if entry is not None:
            return entry

        mh, mw = self.input_hw
        sh, sw = mh - 2 * margin, mw - 2 * margin
        n = ny * nx
        chunk = _balanced_chunk(n, self.runtime.tile_chunk)
        quantum = (int(self.mesh.shape["data"]) if self.mesh is not None
                   else chunk)
        n_pad = ((n + quantum - 1) // quantum) * quantum
        jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        y0 = np.concatenate([(jj.ravel() * sh), np.zeros(n_pad - n, np.int64)])
        x0 = np.concatenate([(ii.ravel() * sw), np.zeros(n_pad - n, np.int64)])

        def stitch(labels):
            labels = labels.reshape(n_pad, mh, mw)[:n]
            slabs = labels[:, margin:margin + sh, margin:margin + sw]
            return (slabs.reshape(ny, nx, sh, sw)
                    .transpose(0, 2, 1, 3)
                    .reshape(ny * sh, nx * sw))

        def fn(vars_r, vars_t, img_u8, ohw):
            from sbb_textline_detection_tpu.ops import threshold
            ph, pw = img_u8.shape[:2]
            iy = jnp.arange(ph, dtype=jnp.int32)[:, None]
            ix = jnp.arange(pw, dtype=jnp.int32)[None, :]
            inside = ((iy >= margin) & (iy < margin + ohw[0])
                      & (ix >= margin) & (ix < margin + ohw[1]))
            t = threshold.otsu_threshold_masked(img_u8[..., 0], inside)

            y0a = jnp.asarray(y0, jnp.int32)
            x0a = jnp.asarray(x0, jnp.int32)

            def get_tile(yy, xx):
                return jax.lax.dynamic_slice(img_u8, (yy, xx, 0), (mh, mw, 3))

            tiles = jax.vmap(get_tile)(y0a, x0a)

            t_tiles = jnp.full((n_pad,), t)
            labels_r, labels_t = self._fused_forward_pair(
                other, vars_r, vars_t, tiles, t_tiles, chunk)
            canvas_r = stitch(labels_r)
            canvas_t = stitch(labels_t)
            inside_c = ((jnp.arange(ny * sh, dtype=jnp.int32)[:, None]
                         < ohw[0])
                        & (jnp.arange(nx * sw, dtype=jnp.int32)[None, :]
                           < ohw[1]))
            canvas_r = self._apply_morph(canvas_r, morph, inside_c)
            if mask_class is not None:
                canvas_r = (canvas_r == np.uint8(mask_class)).astype(jnp.uint8)
                canvas_r = self._apply_morph(canvas_r, post_morph, inside_c)
            pack = pack_ops.pack1_device if bits1 else pack_ops.pack2_device
            if proj:
                # region canvas only + the crop-masked textline row
                # projection (reading order's input, main.py:1809-1822):
                # the big textline half never crosses the ~20 MB/s d2h
                # path. The projection's int32 bytes ride in the SAME
                # packed buffer — one d2h round trip (~35-70 ms latency
                # each on the serving tunnel), not two.
                cols_in = (jnp.arange(nx * sw, dtype=jnp.int32)[None, :]
                           < ohw[1])
                rowsum = jnp.sum(
                    jnp.where(cols_in, canvas_t, jnp.uint8(0)).astype(
                        jnp.int32), axis=1)
                blob = jnp.concatenate(
                    [pack(canvas_r),
                     jax.lax.bitcast_convert_type(
                         rowsum, jnp.uint8).reshape(-1)])
                return blob, canvas_t
            packed = pack(jnp.concatenate([canvas_r, canvas_t], axis=0))
            if keep_dev:
                # second output stays in HBM (no transfer): the resident
                # deskew program reads the textline canvas from here
                return packed, canvas_t
            return packed

        ohw_ex = np.zeros((2,), np.int32)
        entry = self._aot(jax.jit(fn), self.variables, other.variables,
                          example_img, ohw_ex)
        self._tiled_cache[key] = entry
        return entry

    def predict_tiled_host(self, img_u8: np.ndarray,
                           margin_ratio: float = 0.1) -> np.ndarray:
        """Reference-exact host-stitched patch mode (parity oracle for
        predict_tiled; also the fallback for images the device path cannot
        pad — never hit in practice)."""
        h, w = img_u8.shape[:2]
        mh, mw = self.input_hw
        pad_h = max(0, mh - h)
        pad_w = max(0, mw - w)
        img = img_u8
        if pad_h or pad_w:
            img = np.pad(img_u8, ((0, pad_h), (0, pad_w), (0, 0)))
        grid = tiling.compute_grid(img.shape[0], img.shape[1], mh, mw,
                                   margin_ratio)
        tiles = tiling.extract_tiles(img, grid)
        labels = self.predict_labels(tiles)
        stitched = tiling.stitch_labels(labels, grid)
        return stitched[:h, :w]


class ModelBundle:
    """The three pipeline models, loaded once per process (the reference
    reloads each .h5 from disk per page, main.py:216-223/386/442/492)."""

    def __init__(self, page: SegmentationModel, region: SegmentationModel,
                 textline: SegmentationModel):
        self.page = page
        self.region = region
        self.textline = textline

    @property
    def is_dual_head(self) -> bool:
        """True when the region and textline roles are served by one
        dual-head model (region is textline, spec.heads set)."""
        return (self.region is self.textline
                and bool(self.region.spec.heads))

    @staticmethod
    def from_dir(model_dir: str, runtime: RuntimeConfig | None = None,
                 model_names=None, mesh=None) -> "ModelBundle":
        """Load a bundle from `model_dir`. A dual-head checkpoint
        (names.dualhead), when present, serves both the region and
        textline roles; otherwise the two classic checkpoints load
        separately (the upstream three-model layout, main.py:58-60)."""
        import os

        from sbb_textline_detection_tpu.core.config import ModelNames
        from sbb_textline_detection_tpu.models import checkpoint

        names = model_names or ModelNames()
        models = {}
        dual_name = getattr(names, "dualhead", None)
        dual_path = (checkpoint.checkpoint_path(model_dir, dual_name)
                     if dual_name and os.path.exists(
                         checkpoint.npz_path(model_dir, dual_name))
                     else None)
        roles = ["page"] if dual_path else ["page", "region", "textline"]
        for role in roles:
            path = checkpoint.checkpoint_path(model_dir, getattr(names, role))
            spec, variables = checkpoint.load(path)
            models[role] = SegmentationModel(spec, variables, runtime,
                                             mesh=mesh)
        if dual_path:
            spec, variables = checkpoint.load(dual_path)
            if not spec.heads:
                raise ValueError(
                    f"checkpoint {dual_path} is named as the dual-head "
                    "model but its spec carries no head split")
            dual = SegmentationModel(spec, variables, runtime, mesh=mesh)
            models["region"] = models["textline"] = dual
        return ModelBundle(**models)

    @staticmethod
    def random_init(runtime: RuntimeConfig | None = None, seed: int = 0,
                    specs=None, mesh=None,
                    dual_head: bool = False) -> "ModelBundle":
        """Randomly initialized bundle (tests / benchmarks / smoke runs).
        With `dual_head`, one DUALHEAD_SPEC model serves the region and
        textline roles."""
        specs = dict(specs or registry.DEFAULT_SPECS)
        if dual_head:
            specs.pop("region", None)
            specs.pop("textline", None)
        models = {
            role: SegmentationModel(spec, registry.init_variables(spec, seed),
                                    runtime, mesh=mesh)
            for role, spec in specs.items()
        }
        if dual_head:
            dual = SegmentationModel(
                registry.DUALHEAD_SPEC,
                registry.init_variables(registry.DUALHEAD_SPEC, seed),
                runtime, mesh=mesh)
            models["region"] = models["textline"] = dual
        return ModelBundle(**models)

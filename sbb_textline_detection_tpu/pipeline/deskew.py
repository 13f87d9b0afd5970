"""Deskew angle search — TPU-native replacement of reference C13.

The reference rotates each region's textline mask 80 (plus up to 30) times
with cv2.warpAffine on the host, scoring each rotation by the variance of
its Gaussian-smoothed horizontal projection (upstream main.py:1601-1718);
this dominates total runtime and is why the reference fans out over OS
processes (main.py:1721-1799).

Here the whole sweep runs on device without rotating any image: the
projection of a rotated image is a Radon-style transform, and for a fixed
angle it factorizes into two dense matmuls plus an anti-diagonal reduction:

    bin(x, y) = cos(a)·(y-c) - sin(a)·(x-c) + c   (the rotated row index)
    P[r]      = sum_{x,y} I[y,x] · hat(r - bin(x,y))

    A[s, y] = hat(s - (cos(a)(y-c) + c))          # row-resampling matrix
    B[u, x] = hat(u - (-sin(a)(x-c) + S/2))       # column-shear matrix
    U = A @ I @ B^T ;  P[r] = sum_{s+u = r + S//2} U[s, u]

Both matmuls are (S,S,S) GEMMs — pure MXU work; the anti-diagonal sum is a
pad/reshape/column-sum (no gathers). The hat⊛hat bin kernel is a quadratic
B-spline, i.e. an exact rotated projection with a slightly wider bin than
nearest-resampling; the profile is Gaussian-smoothed (sigma=2) immediately
after, so the angle argmax matches the reference's rotate-then-sum scoring.

Regions sweep in fixed `region_batch`-sized groups (one dispatch per group,
one compiled shape per canvas bucket, HBM bounded); within a group the
(region, angle) pairs are flattened and processed in fixed-size chunks under
`lax.map` (bounds the (chunk, S, S) intermediates); canvases upload as
uint8. This replaces both the reference's per-region Python loop and its
multiprocessing layer.

Scoring logic (get_standard_deviation_of_summed_textline_patch_along_width,
main.py:1545-1599) is reproduced on device including its quirks:
  * positive peaks filtered at value > 10; their mean defines the threshold
    grenze = mean·(1 - 1/20.3) (main.py:1584-1593);
  * negative-peak indices are shifted by -20 and index the smoothed profile
    with numpy wrap-around semantics (main.py:1580-1586);
  * an index >= profile length would raise upstream and be caught
    (main.py:1647-1650), making that angle "valid with variance 0" — we flag
    and reproduce that;
  * an angle with no qualifying positive peaks or no sub-grenze negative
    peaks yields NaN upstream and is *excluded* (main.py:1651-1657).

Deliberate deviation: upstream's final argmax indexes the FULL angle array
with the position inside the compacted valid-only array (main.py:1665), an
off-by-k bug whenever any earlier angle was excluded. With upstream's
full-resolution canvas exclusions are rare, so the bug rarely fires there;
our bucketed canvas changes peak-magnitude numerics enough that preserving
the index quirk would *diverge* from upstream's observable output. We index
the valid angles directly, which equals upstream behavior in the common
all-valid case and upstream intent otherwise.

Second deviation: the reference pads each region into its own
1.4·max(h,w) canvas; the batched sweep pads all of a page's crops into one
shared canvas bucket (downscaling only crops that exceed it). Scores are
compared only across angles of the same region on the same canvas, so the
argmax semantics are unchanged.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sbb_textline_detection_tpu.core.config import DeskewConfig
from sbb_textline_detection_tpu.ops import profiles
from sbb_textline_detection_tpu.utils import stagetime

_BUCKETS = (256, 512, 1024, 1536, 2048)

# AOT cache for the (radon, score) programs: keyed on every shape/static
# that reaches the jits. AOT compiling once and dispatching the compiled
# object avoids jit's separate lower-on-call path and exposes each
# program's XLA FLOPs for the stage ledger.
_AOT_CACHE: dict = {}
# Serializes cache-miss compiles: warm_up and process_batch run compile
# helpers from parallel threads; two threads missing the same key must not
# both compile + first-dispatch-load the identical program.
_AOT_LOCK = __import__("threading").RLock()


def _aot_radon_score(canv_shape, n_angles: int, f_pad: int, s: int,
                     chunk: int, use_pallas: bool):
    key = (canv_shape, n_angles, f_pad, s, chunk, use_pallas)
    with _AOT_LOCK:
        return _aot_radon_score_locked(key, canv_shape, n_angles, f_pad, s,
                                       chunk, use_pallas)


def _aot_radon_score_locked(key, canv_shape, n_angles, f_pad, s, chunk,
                            use_pallas):
    entry = _AOT_CACHE.get(key)
    if entry is None:
        r = canv_shape[0]
        # canvases travel 1-bit packed (ops/pack.py): binary (R, S, S)
        # uint8 would otherwise cost R*S^2 bytes per sweep group over the
        # h2d tunnel (~8 MB per 8-region group at the 1024 bucket).
        canv = jax.ShapeDtypeStruct(((r * s * s + 7) // 8,), jnp.uint8)
        ang = jax.ShapeDtypeStruct((n_angles,), jnp.float32)
        idx = jax.ShapeDtypeStruct((f_pad,), jnp.int32)
        radon = _radon_profiles_batched.lower(
            canv, ang, idx, idx, r=r, s=s, chunk=chunk,
            use_pallas=use_pallas).compile()
        # score statics must match _sweep_batched's call site; they are
        # re-lowered per config via the outer key when they differ.
        entry = (radon, stagetime.flops_of(radon))
        _AOT_CACHE[key] = entry
    return entry


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _radon_pairs(canvases: jax.Array, angles: jax.Array,
                 region_idx: jax.Array, angle_idx: jax.Array,
                 s: int, chunk: int, use_pallas: bool) -> jax.Array:
    """(R, S, S) float32 canvases + flattened (F,) (region, angle) pairs ->
    (F, S) rotated projections, computed in `chunk`-sized blocks
    (F % chunk == 0). Shared by the packed-upload sweep and the
    device-resident sweep."""
    c = float(s // 2)
    idx = jnp.arange(s, dtype=jnp.float32)

    def block(pair):
        ridx, aidx = pair
        rad = jnp.deg2rad(angles[aidx])              # (chunk,)
        a = jnp.cos(rad)
        b = jnp.sin(rad)
        # A[k, q, y] = hat(q - (a_k*(y-c) + c))
        fy = a[:, None] * (idx - c) + c              # (chunk, S)
        A = _hat(idx[None, :, None] - fy[:, None, :])
        gx = -b[:, None] * (idx - c) + float(s // 2)
        I = canvases[ridx]                           # (chunk, S, S)
        if use_pallas:
            from sbb_textline_detection_tpu.ops import pallas_radon
            # B laid out [x, u] so the kernel computes (A I) @ B directly.
            Bxu = _hat(idx[None, None, :] - gx[:, :, None])
            return pallas_radon.radon_profiles_pallas(A, I, Bxu)
        B = _hat(idx[None, :, None] - gx[:, None, :])
        U = jnp.einsum("ksy,kyx,kux->ksu", A, I, B,
                       preferred_element_type=jnp.float32)
        # anti-diagonal sums via pad/reshape: D[k, t] = sum_s U[k, s, t-s]
        L = 2 * s
        W = jnp.pad(U, ((0, 0), (0, 0), (0, L - s)))
        flat = W.reshape(W.shape[0], -1)[:, : s * (L - 1)].reshape(
            W.shape[0], s, L - 1)
        D = flat.sum(axis=1)
        return jax.lax.dynamic_slice_in_dim(D, s // 2, s, axis=1)

    f = region_idx.shape[0]
    P = jax.lax.map(block, (region_idx.reshape(f // chunk, chunk),
                            angle_idx.reshape(f // chunk, chunk)))
    return P.reshape(f, s)


@functools.partial(jax.jit,
                   static_argnames=("r", "s", "chunk", "use_pallas"))
def _radon_profiles_batched(canvases_packed: jax.Array, angles: jax.Array,
                            region_idx: jax.Array, angle_idx: jax.Array,
                            r: int, s: int, chunk: int,
                            use_pallas: bool = False) -> jax.Array:
    """1-bit-packed (R*S*S/8,) binary canvases + flattened (F,) (region,
    angle) pairs -> (F, S) projections."""
    from sbb_textline_detection_tpu.ops import pack as pack_ops

    canvases = pack_ops.unpack1_device(
        canvases_packed, (r, s, s)).astype(jnp.float32)
    return _radon_pairs(canvases, angles, region_idx, angle_idx, s, chunk,
                        use_pallas)


@functools.partial(jax.jit, static_argnames=("sigma", "multiplier", "pos_min"))
def _score_profiles(P: jax.Array, sigma: float = 2.0,
                    multiplier: float = 20.3, pos_min: float = 10.0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Jit wrapper over _score_profiles_impl (dispatch path of the
    packed-upload sweep; the resident program calls the impl in-graph)."""
    return _score_profiles_impl(P, sigma, multiplier, pos_min)


def _score_profiles_impl(P: jax.Array, sigma: float = 2.0,
                         multiplier: float = 20.3, pos_min: float = 10.0
                         ) -> jax.Array:
    """Stacked (2, ...) float32: [valid (0/1), score] per profile."""
    s_len = P.shape[-1]
    z = profiles.gaussian_filter1d(P, sigma)

    y_help = jnp.pad(P, [(0, 0)] * (P.ndim - 1) + [(10, 10)])
    zneg_rev = jnp.max(y_help, axis=-1, keepdims=True) - y_help
    zneg = jnp.pad(zneg_rev, [(0, 0)] * (P.ndim - 1) + [(10, 10)])
    zneg = profiles.gaussian_filter1d(zneg, sigma)      # (..., S+40)

    pmask = profiles.peak_mask(z)
    nmask = profiles.peak_mask(zneg)

    pos_sel = pmask & (z > pos_min)
    pos_cnt = pos_sel.sum(axis=-1)
    mpp = jnp.where(pos_cnt > 0,
                    (z * pos_sel).sum(axis=-1) / jnp.maximum(pos_cnt, 1), jnp.nan)
    grenze = mpp - mpp / multiplier                      # (...,)

    q = jnp.arange(s_len + 40) - 20                      # z-index per zneg pos
    oob = nmask & (q >= s_len)
    any_oob = oob.any(axis=-1)
    if s_len >= 20:
        # q % s_len maps [-20..-1] -> tail, [s_len..] -> head: the wrap
        # gather IS this concatenation (numpy wrap semantics), and
        # concat-of-slices lowers to copies instead of a gather
        zq = jnp.concatenate([z[..., -20:], z, z[..., :20]], axis=-1)
    else:
        zq = jnp.take(z, q % s_len, axis=-1)             # numpy wrap semantics
    neg_sel = nmask & (zq < grenze[..., None])
    neg_cnt = neg_sel.sum(axis=-1)

    var = jnp.std(z, axis=-1)
    valid = (pos_cnt > 0) & (neg_cnt > 0) & ~any_oob
    # upstream: an indexing error is caught and the angle is kept with
    # variance 0 (main.py:1647-1650)
    score = jnp.where(any_oob, 0.0, var)
    # one stacked f32 result = one device->host transfer (the tunnel pays
    # ~70 ms latency per transfer)
    return jnp.stack([(valid | any_oob).astype(jnp.float32), score])


# ---------------------------------------------------------------------------
# Device-resident deskew + line-profile machinery (round 3).
#
# The host path (below) crops/erodes/renders each region's sweep canvas on
# the 1-core host, then after the sweep re-crops for the line separator's
# morph + rotate + projection — measured ~1.2 s/page of host work. The
# resident path runs the ENTIRE per-region chain in one device dispatch per
# region group, reading the textline mask where the fused segmentation
# program left it (HBM):
#
#   crop gather -> erode x2 -> sweep canvases -> coarse+vertical Radon
#   sweeps -> slope decision -> morph OPEN+CLOSE -> rotated projection
#   profiles -> one tiny f32 transfer (slopes + profiles).
#
# The line profile is computed as the EXACT rotated projection (the same
# hat-kernel factorization the sweep uses, at the decided slope) of the
# morphed mask instead of bicubic-warp + threshold + row-sum
# (main.py:1485-1497 upstream) — see DEVIATIONS.md #10. At slope 0 the hat
# matrices are exact identity/delta matrices, so unskewed regions produce
# BIT-IDENTICAL profiles to the host path (tests/test_deskew_resident.py).
# ---------------------------------------------------------------------------


def _canvas_index_maps(h: int, w: int, s: int, pad_factor: float
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-axis source-index maps of the sweep-canvas render: entry i of
    cy is the crop row rendered at canvas row i (-1 = blank), including
    the 1.4x-pad downscale decision and the centered placement.

    The downscale indices use EXACT integer floors — nh = (h*s)//target,
    iy[j] = (j*h)//nh — not float-step truncation: the speculative deskew
    program computes these maps in-graph from traced crop dims
    (_canvas_maps_graph), and float double-rounding (trunc(j*fl(h/nh)))
    disagrees with the exact floor on ~10% of downscaled crop sizes
    (tests/test_deskew_spec.py pinned it), which would silently route
    those regions past the speculative match. The sweep canvas is already
    a documented deviation from the reference's per-region
    1.4*max(h,w) canvas (module docstring); the index model within it is
    ours to fix. All three implementations (this, _canvas_maps_graph,
    _canvas_maps_graph_host) are now identical by construction."""
    target = int(max(h, w) * pad_factor)
    if target > s:
        nh = max(1, (h * s) // max(target, 1))
        nw = max(1, (w * s) // max(target, 1))
        iy = (np.arange(nh, dtype=np.int64) * h) // nh
        ix = (np.arange(nw, dtype=np.int64) * w) // nw
    else:
        nh, nw = h, w
        iy = np.arange(h, dtype=np.int64)
        ix = np.arange(w, dtype=np.int64)
    cy = np.full(s, -1, np.int32)
    cx = np.full(s, -1, np.int32)
    y0 = s // 2 - nh // 2
    x0 = s // 2 - nw // 2
    cy[y0:y0 + nh] = iy
    cx[x0:x0 + nw] = ix
    return cy, cx


def _min_sep_u8(x: jax.Array, k: int) -> jax.Array:
    """Separable k x k min filter over the trailing two axes of (B, H, W)
    uint8 (erode; border pads with the neutral 255). Computed in bf16 —
    exact for integers <= 256 and a friendlier reduce_window lowering
    than u8 (the stage ablation in PERF.md flagged the u8 lowering)."""
    pad = k // 2
    xb = x.astype(jnp.bfloat16)
    init = jnp.bfloat16(255)
    xb = jax.lax.reduce_window(xb, init, jax.lax.min,
                               (1, k, 1), (1, 1, 1),
                               ((0, 0), (pad, pad), (0, 0)))
    xb = jax.lax.reduce_window(xb, init, jax.lax.min,
                               (1, 1, k), (1, 1, 1),
                               ((0, 0), (0, 0), (pad, pad)))
    return xb.astype(jnp.uint8)


def _max_sep_u8(x: jax.Array, k: int) -> jax.Array:
    """Separable k x k max filter (dilate; border pads with the neutral 0);
    bf16 compute like _min_sep_u8."""
    pad = k // 2
    xb = x.astype(jnp.bfloat16)
    init = jnp.bfloat16(0)
    xb = jax.lax.reduce_window(xb, init, jax.lax.max,
                               (1, k, 1), (1, 1, 1),
                               ((0, 0), (pad, pad), (0, 0)))
    xb = jax.lax.reduce_window(xb, init, jax.lax.max,
                               (1, 1, k), (1, 1, 1),
                               ((0, 0), (0, 0), (pad, pad)))
    return xb.astype(jnp.uint8)


def _hat_projection_rows(m: jax.Array, h, w, angle_deg, bufH: int,
                         bufW: int) -> jax.Array:
    """Row profile of `m` rotated by `angle_deg` about (w//2, h//2):
    P[r] = total mass landing in dst row r (cv2 rotation convention,
    dst_row = -sin*dx + cos*dy + cy). Exact row sums at angle 0 (the hat
    matrices degenerate to identity/delta). m: (bufH, bufW) f32 with zero
    mass outside the (h, w) crop; h, w, angle_deg are traced scalars."""
    rad = jnp.deg2rad(angle_deg)
    a = jnp.cos(rad)
    b = jnp.sin(rad)
    cy0 = (jnp.asarray(h) // 2).astype(jnp.float32)
    cx0 = (jnp.asarray(w) // 2).astype(jnp.float32)
    K = bufW // 2
    sy = jnp.arange(bufH, dtype=jnp.float32)
    sx = jnp.arange(bufW, dtype=jnp.float32)
    fy = a * (sy - cy0) + cy0                     # dst-row bin per src row
    A = _hat(sy[:, None] - fy[None, :])           # (s_bin, y)
    gx = -b * (sx - cx0) + jnp.float32(K)         # shear bin per src col
    B = _hat(sx[:, None] - gx[None, :])           # (u_bin, x)
    U = jnp.einsum("sy,yx,ux->su", A, m, B,
                   preferred_element_type=jnp.float32)
    L = bufH + bufW
    Wp = jnp.pad(U, ((0, 0), (0, L - bufW)))
    flat = Wp.reshape(-1)[: bufH * (L - 1)].reshape(bufH, L - 1)
    D = flat.sum(axis=0)                          # D[t] = sum_s U[s, t-s]
    return D[K:K + bufH]


def _canvas_maps_graph(h, w, s: int, target_table: jax.Array):
    """In-graph twin of _canvas_index_maps for TRACED crop dims (h, w):
    entry i of cy is the crop row rendered at canvas row i (-1 = blank),
    including the pad_factor downscale decision and centered placement.
    `target_table[m] = int(m * pad_factor)` is a host-built constant, so
    the trigger is bit-exact; the downscale indices are the same exact
    integer floors _canvas_index_maps uses — identical by construction
    (tests/test_deskew_spec.py). Used by the SPECULATIVE deskew program
    (DEVIATIONS #16)."""
    mx = jnp.clip(jnp.maximum(h, w), 0, target_table.shape[0] - 1)
    target = jnp.maximum(target_table[mx], 1)
    down = target > s
    nh = jnp.where(down, jnp.maximum(1, (h * s) // target), h)
    nw = jnp.where(down, jnp.maximum(1, (w * s) // target), w)
    i = jnp.arange(s, dtype=jnp.int32)

    def axis_map(n, d):
        j = i - (s // 2 - n // 2)
        src = jnp.clip((j * d) // jnp.maximum(n, 1), 0,
                       jnp.maximum(d - 1, 0))
        return jnp.where((j >= 0) & (j < n) & (d > 0), src,
                         jnp.int32(-1)).astype(jnp.int32)

    return axis_map(nh, h), axis_map(nw, w)


def _canvas_maps_graph_host(h: int, w: int, s: int, pad_factor: float
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy twin of _canvas_maps_graph (exact integer arithmetic, no
    tracing): what the SPECULATIVE program rendered for an (h, w) crop.
    spec_finalize compares this against _canvas_index_maps per matched
    region; since all three implementations use the same exact integer
    floors the check is always-true today — it stays as a guard against
    future drift in either implementation (a silent mismatch would
    un-speculate regions, correct but slow)."""
    target = max(int(max(h, w) * pad_factor), 1)
    if target > s:
        nh = max(1, (h * s) // target)
        nw = max(1, (w * s) // target)
    else:
        nh, nw = h, w

    def axis_map(n, d):
        out = np.full(s, -1, np.int32)
        j = np.arange(s, dtype=np.int64) - (s // 2 - n // 2)
        ok = (j >= 0) & (j < n) & (d > 0)
        src = np.clip((j * d) // max(n, 1), 0, max(d - 1, 0))
        out[ok] = src[ok]
        return out

    return axis_map(nh, h), axis_map(nw, w)


class _SpecPending:
    """Handle of one speculative resident-deskew dispatch (device boxes):
    the program's output stays on device until spec_finalize matched the
    host contour boxes against the fetched device boxes."""

    def __init__(self, out_dev, flops, s, bufH, bufW, slots, mask_dev):
        self.out_dev = out_dev
        self.flops = flops
        self.s = s
        self.bufH = bufH
        self.bufW = bufW
        self.slots = slots
        self.mask_dev = mask_dev


class _SpecResolved:
    """spec_finalize's result: per-region slot mapping into a fetched
    speculative output plus an ordinary resident_dispatch pending for
    unmatched regions. Consumed by DeskewEngine.resident_collect."""

    def __init__(self, pending: _SpecPending, out, mapping, boxes_xywh,
                 fallback):
        self.pending = pending
        self.out = out                    # fetched (slots, 5+1+bufH+bufW)
        self.mapping = mapping            # per region: slot idx or -1
        self.boxes = boxes_xywh           # host boxes (x,y,w,h) order
        self.fallback = fallback          # resident_dispatch pending or None


def _resident_chain(mask, boxes, cy, cx, angles, *, B, ac_n, f, ridx, aidx,
                    s, chunk, use_pallas, cfg, erode_eff, morph_k,
                    bufH, bufW):
    """The per-region device chain shared by the resident program (host
    boxes + host canvas maps) and the SPECULATIVE program (device boxes +
    in-graph maps): crop gather -> erode -> canvas render -> coarse +
    vertical Radon sweeps -> scores -> slope decision -> OPEN/CLOSE ->
    rotated-projection profiles. `boxes`: (B, 4) int32 [y, x, h, w];
    returns (B, 1 + bufH + bufW) float32 [slope | row profile | col
    profile]. Values are independent of B (slots are independent; the
    lax.map chunking changes block membership, not per-pair arithmetic)
    and of bufH/bufW (out-of-crop cells are neutral and contribute exact
    zeros) — the bit-parity basis of the speculative match."""
    a_all = int(angles.shape[0])
    binm = (mask != 0).astype(jnp.uint8)
    padded = jnp.pad(binm, ((0, bufH), (0, bufW)))
    ar = jnp.arange(bufH, dtype=jnp.int32)
    acol = jnp.arange(bufW, dtype=jnp.int32)

    def crop_of(box):
        # crop at origin; out-of-crop = 1 (erode neutral, matching the
        # host path's +inf border, main.py:1734 semantics)
        sl = jax.lax.dynamic_slice(padded, (box[0], box[1]),
                                   (bufH, bufW))
        inside = (ar[:, None] < box[2]) & (acol[None, :] < box[3])
        return jnp.where(inside, sl, jnp.uint8(1))

    crops = jax.vmap(crop_of)(boxes)
    e2 = _min_sep_u8(crops, erode_eff)

    def render(eb, cyb, cxb):
        rows = jnp.take(eb, jnp.clip(cyb, 0, bufH - 1), axis=0)
        cv = jnp.take(rows, jnp.clip(cxb, 0, bufW - 1), axis=1)
        ok = (cyb[:, None] >= 0) & (cxb[None, :] >= 0)
        return jnp.where(ok, cv, jnp.uint8(0))

    canv = jax.vmap(render)(e2, cy, cx).astype(jnp.float32)
    P = _radon_pairs(canv, angles,
                     jnp.asarray(ridx, jnp.int32),
                     jnp.asarray(aidx, jnp.int32),
                     s, chunk, use_pallas)
    vs = _score_profiles_impl(
        P, sigma=float(cfg.sigma),
        multiplier=float(cfg.peak_threshold_multiplier),
        pos_min=float(cfg.pos_peak_min_value))
    valid = vs[0][:f].reshape(B, a_all) != 0.0
    score = vs[1][:f].reshape(B, a_all)

    def pick(v, sc, ang):
        masked = jnp.where(v, sc, -jnp.inf)
        return (jnp.where(v.any(), ang[jnp.argmax(masked)], 0.0),
                jnp.max(masked))

    slope_c, score_c = jax.vmap(
        lambda v, sc: pick(v, sc, angles[:ac_n]))(
            valid[:, :ac_n], score[:, :ac_n])
    slope_v, score_v = jax.vmap(
        lambda v, sc: pick(v, sc, angles[ac_n:]))(
            valid[:, ac_n:], score[:, ac_n:])
    if cfg.vertical_resweep_guard:
        # DEVIATIONS #15: orientation by score — take the vertical-range
        # result exactly when it out-scores the coarse one (same scorer,
        # same canvas). Upstream only consults the vertical sweep when
        # |coarse| > 15 and then replaces unconditionally
        # (main.py:1669-1714): wide vertical-text regions whose flat
        # coarse profile argmaxes near 0 never reach it (measured: 7 of
        # 10 regions on the bench vertical page, 1 line emitted instead
        # of 8-11), and 15-25-degree horizontal text always loses to it.
        take_v = score_v > score_c
    else:
        take_v = jnp.abs(slope_c) > cfg.vertical_trigger_angle
    raw = jnp.where(take_v, slope_v, slope_c)
    final = jnp.where(jnp.abs(raw) > cfg.slope_reject_abs,
                      0.0, raw).astype(jnp.float32)

    def insided(x, fill):
        def one(xb, box):
            inside = ((ar[:, None] < box[2])
                      & (acol[None, :] < box[3]))
            return jnp.where(inside, xb, jnp.uint8(fill))
        return jax.vmap(one)(x, boxes)

    # OPEN then CLOSE (main.py:1478-1479) with the host path's
    # neutral-border discipline per primitive
    post = insided(e2, 1)
    post = _min_sep_u8(post, morph_k)
    post = insided(post, 0)
    post = _max_sep_u8(post, morph_k)
    post = insided(post, 0)
    post = _max_sep_u8(post, morph_k)
    post = insided(post, 1)
    post = _min_sep_u8(post, morph_k)
    post = insided(post, 0)

    def prof_of(args):
        m_u8, box, ang = args
        m = m_u8.astype(jnp.float32)
        h, w = box[2], box[3]
        p1 = _hat_projection_rows(m, h, w, ang, bufH, bufW)
        p0 = _hat_projection_rows(m.T, w, h, -ang, bufW, bufH)
        return p1, p0

    p1, p0 = jax.lax.map(prof_of, (post, boxes, final))
    return jnp.concatenate([final[:, None], p1, p0], axis=1)


class DeskewEngine:
    """Batched deskew sweeps: one device dispatch for all regions of a page."""

    def __init__(self, cfg: DeskewConfig = DeskewConfig(),
                 max_canvas: int = 2048, chunk: int = 8,
                 use_pallas: bool | None = None, region_batch: int = 8,
                 morph_kernel: int = 5, crop_erode_iterations: int = 2,
                 buf_max: int = 2816):
        self.cfg = cfg
        self.max_canvas = max_canvas
        self.chunk = chunk
        # resident-path statics: crop-erode (main.py:1734) and the line
        # separator's OPEN/CLOSE kernel (main.py:1478-1479); buf_max caps
        # the static full-resolution crop buffer (larger regions fall back
        # to the host path)
        self._erode_k = morph_kernel
        self._erode_it = crop_erode_iterations
        self._morph_k = morph_kernel
        self.buf_max = buf_max
        # Regions sweep in fixed-size groups: one compiled (B, S, S) program
        # per canvas bucket and bounded HBM (4·B·S² bytes for the float32
        # canvases) regardless of how many regions a page has — dense
        # newspaper pages routinely carry 100+.
        self.region_batch = max(1, region_batch)
        # None = auto: the fused Pallas kernel on TPU (for supported canvas
        # sizes), the XLA einsum path elsewhere.
        self.use_pallas = use_pallas
        self._coarse = np.linspace(cfg.coarse_range[0], cfg.coarse_range[1],
                                   cfg.coarse_steps).astype(np.float32)
        self._vertical = np.linspace(cfg.vertical_range[0],
                                     cfg.vertical_range[1],
                                     cfg.vertical_steps).astype(np.float32)

    def _canvas_into(self, crop: np.ndarray, out: np.ndarray) -> None:
        """Center `crop` (binarized, downscaled if needed) into square
        `out` — exactly the _canvas_index_maps gather, so the host sweep
        path, the resident program, and the speculative program all
        render identical canvases (see _canvas_index_maps on the integer
        downscale indices)."""
        s = out.shape[0]
        h, w = crop.shape
        cy, cx = _canvas_index_maps(h, w, s, self.cfg.pad_factor)
        oky = cy >= 0
        okx = cx >= 0
        out[np.ix_(oky, okx)] = crop[np.ix_(cy[oky], cx[okx])] != 0

    def _bucket_for(self, crops: Sequence[np.ndarray]) -> int:
        target = 32
        for c in crops:
            target = max(target, int(max(c.shape) * self.cfg.pad_factor))
        return next((b for b in _BUCKETS if b >= target and
                     b <= self.max_canvas), self.max_canvas)

    def _sweep_dispatch(self, canvases: np.ndarray, s: int,
                        angles: np.ndarray):
        """Dispatch one group's sweep; returns (vs_dev, flops): the
        on-device stacked [valid, score] array (fetch deferred so several
        groups' sweeps queue on the device before the first result is
        pulled back) plus the program's FLOPs, which are accounted at
        collect time — where the fetch actually blocks on execution."""
        r = canvases.shape[0]
        a = angles.shape[0]
        f = r * a
        chunk = min(self.chunk, f)
        f_pad = ((f + chunk - 1) // chunk) * chunk
        ridx = np.repeat(np.arange(r), a)
        aidx = np.tile(np.arange(a), r)
        ridx = np.concatenate([ridx, np.zeros(f_pad - f, np.int64)])
        aidx = np.concatenate([aidx, np.zeros(f_pad - f, np.int64)])
        use_pallas = self.use_pallas
        if use_pallas is None:
            from sbb_textline_detection_tpu.ops import pallas_radon
            import jax as _jax
            use_pallas = (_jax.default_backend() == "tpu"
                          and pallas_radon.supported(s))
        radon, radon_flops = _aot_radon_score(
            canvases.shape, angles.shape[0], f_pad, s, chunk,
            bool(use_pallas))
        from sbb_textline_detection_tpu.ops import pack as pack_ops
        packed = pack_ops.pack1_host(canvases)
        t0 = __import__("time").time()
        P = radon(jnp.asarray(packed), jnp.asarray(angles),
                  jnp.asarray(ridx, jnp.int32),
                  jnp.asarray(aidx, jnp.int32))
        vs_dev = _score_profiles(
            P, sigma=float(self.cfg.sigma),
            multiplier=float(self.cfg.peak_threshold_multiplier),
            pos_min=float(self.cfg.pos_peak_min_value))
        stagetime.add(__import__("time").time() - t0, 0.0)
        return vs_dev, radon_flops

    def _sweep_collect(self, vs_dev, r: int, angles: np.ndarray,
                       flops: float = 0.0) -> List[Tuple[float, float]]:
        """Fetch one group's [valid, score] result and pick per-region
        (best angle, best score) pairs (upstream argmax semantics, see
        module docstring; the score rides along for the vertical
        re-sweep guard, DEVIATIONS #15). The sweep program's FLOPs are
        accounted here: np.asarray blocks on the actual execution, so
        this is where the device seconds accrue."""
        a = angles.shape[0]
        f = r * a
        with stagetime.device_section(flops):
            vs = np.asarray(vs_dev)
        valid = vs[0, :f].reshape(r, a) != 0.0
        score = vs[1, :f].reshape(r, a)
        out = []
        for i in range(r):
            v = valid[i]
            if not v.any():
                # upstream: argmax of empty -> except -> 0
                out.append((0.0, float("-inf")))
            else:
                j = int(np.argmax(score[i][v]))
                out.append((float(angles[v][j]), float(score[i][v][j])))
        return out

    def _sweep_batched(self, canvases: np.ndarray, s: int,
                       angles: np.ndarray) -> List[Tuple[float, float]]:
        """(R, S, S) canvases -> per-region (best angle, best score)."""
        vs_dev, flops = self._sweep_dispatch(canvases, s, angles)
        return self._sweep_collect(vs_dev, canvases.shape[0], angles, flops)

    # -- public API ----------------------------------------------------------
    def best_angles(self, crops: Sequence[np.ndarray]) -> List[float]:
        """Reference return_deskew_slope (main.py:1601-1718) for every region
        of a page in batched sweeps: coarse [-25, 25] plus the vertical
        [-90, -50] range, combined per DEVIATIONS #15 (score comparison by
        default; reference-faithful trigger+clobber at
        vertical_resweep_guard=False)."""
        crops = list(crops)
        if not crops:
            return []
        s = self._bucket_for(crops)
        # Regions are processed in fixed region_batch-sized groups: (B, S, S)
        # is the only compiled shape per canvas bucket, and HBM stays bounded
        # however many regions the page has. Empty canvas slots score
        # all-invalid -> 0.0 and are discarded.
        coarse = self._sweep_grouped(
            crops, s, self._coarse,
            render=lambda crop, out: self._canvas_into(crop, out))
        angles = [a for a, _ in coarse]
        if self.cfg.vertical_resweep_guard:
            # DEVIATIONS #15: orientation by score — sweep the vertical
            # range for EVERY region and take its result exactly when it
            # out-scores the coarse one (the resident program computes
            # both sweeps unconditionally; this keeps the fallback path
            # decision-identical).
            vert = self._sweep_grouped(
                crops, s, self._vertical,
                render=lambda crop, out: self._canvas_into(crop, out))
            for i, (va, vsc) in enumerate(vert):
                if vsc > coarse[i][1]:
                    angles[i] = va
            return angles
        # reference-faithful: re-sweep only the steep regions and replace
        # unconditionally (main.py:1669-1714)
        steep = [i for i, a in enumerate(angles)
                 if abs(a) > self.cfg.vertical_trigger_angle]
        if steep:
            vert = self._sweep_grouped(
                [crops[i] for i in steep], s, self._vertical,
                render=lambda crop, out: self._canvas_into(crop, out))
            for i, (va, _) in zip(steep, vert):
                angles[i] = va
        return angles

    def _batch_buckets(self) -> List[int]:
        """Region-batch shape buckets: powers of two up to region_batch.
        A page's regions are split greedily into the largest bucket that
        fits, so a 1-2 region tail (or a 1-2 region vertical re-sweep)
        doesn't pay for a full region_batch-sized sweep of empty slots."""
        b, buckets = 1, []
        while b < self.region_batch:
            buckets.append(b)
            b *= 2
        buckets.append(self.region_batch)
        return buckets

    def _sweep_grouped(self, crops: Sequence[np.ndarray], s: int,
                       angles: np.ndarray, render) -> List[float]:
        buckets = self._batch_buckets()

        def rendered_groups():
            # ONE copy of the bucket-selection + canvas-render rule for
            # both execution modes below
            start = 0
            while start < len(crops):
                remaining = len(crops) - start
                b = next((bb for bb in buckets if bb >= remaining),
                         buckets[-1])
                group = crops[start:start + b]
                buf = np.zeros((b, s, s), dtype=np.uint8)
                for i, crop in enumerate(group):
                    render(crop, buf[i])
                yield buf, b, len(group)
                start += b

        # _sweep_batched is the behavioral seam (tests stub it per group);
        # an instance-level override bypasses the dispatch/collect split
        if "_sweep_batched" in self.__dict__:
            out: List[float] = []
            for buf, b, n_real in rendered_groups():
                out.extend(self._sweep_batched(buf, s, angles)[:n_real])
            return out
        # dispatch every group's sweep first, then fetch: the groups queue
        # back to back on the device instead of paying one dispatch+fetch
        # round trip (~35 ms on the serving tunnel) per group
        pending = [(self._sweep_dispatch(buf, s, angles), b, n_real)
                   for buf, b, n_real in rendered_groups()]
        out = []
        for (vs_dev, flops), b, n_real in pending:
            out.extend(self._sweep_collect(vs_dev, b, angles,
                                           flops)[:n_real])
        return out

    def best_angle(self, crop: np.ndarray) -> float:
        return self.best_angles([crop])[0]

    # -- device-resident path ------------------------------------------------
    def _bucket_for_sizes(self, sizes) -> int:
        target = 32
        for h, w in sizes:
            target = max(target, int(max(h, w) * self.cfg.pad_factor))
        return next((b for b in _BUCKETS if b >= target and
                     b <= self.max_canvas), self.max_canvas)

    def _aot_resident(self, mask_shape, s: int, bufH: int, bufW: int,
                      B: Optional[int] = None):
        """AOT-compile (once per shape) the one-dispatch resident program:
        crops -> erode x2 -> canvases -> coarse+vertical radon -> scores ->
        slope decision -> OPEN+CLOSE -> rotated-projection profiles.
        `B` is the slot count (default region_batch); 1-2 region tails use
        a 2-slot program — exec scales ~linearly with slots (~12 ms/slot
        measured), so padding a small tail to 8 slots wastes ~70 ms. See
        resident_dispatch for why the shape grid stays this coarse."""
        B = B or self.region_batch
        cfg = self.cfg
        ac_n = self._coarse.shape[0]
        av_n = self._vertical.shape[0]
        a_all = ac_n + av_n
        f = B * a_all
        chunk = min(self.chunk, f)
        f_pad = ((f + chunk - 1) // chunk) * chunk
        use_pallas = self.use_pallas
        if use_pallas is None:
            from sbb_textline_detection_tpu.ops import pallas_radon
            use_pallas = (jax.default_backend() == "tpu"
                          and pallas_radon.supported(s))
        use_pallas = bool(use_pallas)
        key = ("resident", tuple(mask_shape), s, B, bufH, bufW, ac_n, av_n,
               chunk, use_pallas, float(cfg.sigma),
               float(cfg.peak_threshold_multiplier),
               float(cfg.pos_peak_min_value),
               float(cfg.vertical_trigger_angle),
               float(cfg.slope_reject_abs),
               bool(cfg.vertical_resweep_guard),
               self._erode_k, self._erode_it, self._morph_k)
        entry = _AOT_CACHE.get(key)
        if entry is not None:
            return entry
        with _AOT_LOCK:
            return self._resident_fn_locked(key, mask_shape, s, B, bufH,
                                            bufW, ac_n, av_n, chunk,
                                            use_pallas, cfg)

    def _resident_fn_locked(self, key, mask_shape, s, B, bufH, bufW, ac_n,
                            av_n, chunk, use_pallas, cfg):
        entry = _AOT_CACHE.get(key)
        if entry is not None:
            return entry
        a_all = ac_n + av_n
        f = B * a_all
        f_pad = ((f + chunk - 1) // chunk) * chunk

        erode_eff = (self._erode_k - 1) * self._erode_it + 1
        morph_k = self._morph_k
        ridx = np.repeat(np.arange(B), a_all)
        aidx = np.tile(np.arange(a_all), B)
        ridx = np.concatenate([ridx, np.zeros(f_pad - f, np.int64)])
        aidx = np.concatenate([aidx, np.zeros(f_pad - f, np.int64)])
        H, W = mask_shape

        def fn(mask, boxes, cy, cx, angles):
            # boxes: (B, 4) int32 [y, x, h, w]
            return _resident_chain(
                mask, boxes, cy, cx, angles, B=B, ac_n=ac_n, f=f,
                ridx=ridx, aidx=aidx, s=s, chunk=chunk,
                use_pallas=use_pallas, cfg=cfg, erode_eff=erode_eff,
                morph_k=morph_k, bufH=bufH, bufW=bufW)

        mask_ex = jax.ShapeDtypeStruct((H, W), jnp.uint8)
        boxes_ex = jax.ShapeDtypeStruct((B, 4), jnp.int32)
        cyx_ex = jax.ShapeDtypeStruct((B, s), jnp.int32)
        ang_ex = jax.ShapeDtypeStruct((a_all,), jnp.float32)
        compiled = jax.jit(fn).lower(mask_ex, boxes_ex, cyx_ex, cyx_ex,
                                     ang_ex).compile()
        entry = (compiled, stagetime.flops_of(compiled))
        _AOT_CACHE[key] = entry
        return entry

    def resident_buffer_shape(self, mask_shape) -> Tuple[int, int]:
        H, W = mask_shape
        return (min(-(-H // 256) * 256, self.buf_max),
                min(-(-W // 256) * 256, self.buf_max))

    def slopes_and_profiles_resident(self, mask_dev, boxes_xywh):
        """Full deskew + line-profile device phase from the RESIDENT
        textline canvas (the fused segmentation program's on-device
        output): returns (slopes, profiles) with slopes the FINAL
        per-region values (vertical re-sweep + reject logic applied, as in
        slopes_and_lines) and profiles[i] = (row_profile[:h], col_profile
        [:w]) float32 — exact pixel-count projections of the morphed,
        deskewed region mask (see module section comment / DEVIATIONS #10).

        Raises ValueError when any region exceeds the static crop buffer
        (the caller falls back to the host path)."""
        return self.resident_collect(
            self.resident_dispatch(mask_dev, boxes_xywh))

    def resident_dispatch(self, mask_dev, boxes_xywh):
        """Enqueue the resident deskew programs for all region groups and
        return a handle for resident_collect. Split out so the pipelined
        batch can dispatch page N's deskew BEFORE page N+1's device phase
        enqueues — the chip executes programs in order, so dispatching
        late would serialize N's host phase behind N+1's segmentation."""
        boxes_xywh = [list(map(int, b)) for b in boxes_xywh]
        n = len(boxes_xywh)
        if n == 0:
            return []
        H, W = mask_dev.shape
        capH, capW = self.resident_buffer_shape((H, W))
        for x, y, w, h in boxes_xywh:
            if h > capH or w > capW:
                raise ValueError(
                    f"region {h}x{w} exceeds the resident deskew buffer "
                    f"{capH}x{capW}; host path required")
        s = self._bucket_for_sizes([(b[3], b[2]) for b in boxes_xywh])
        angles = np.concatenate([self._coarse, self._vertical])

        # The shape space is deliberately TINY: {2, region_batch} slots x
        # {1024, capH} buffer heights x one width — at most 4 compiled
        # programs per (mask, s), all loadable in parallel at warm_up.
        # Finer-grained right-sizing (256-px buffer steps, all power-of-two
        # slot counts) measured faster per dispatch but mints a fresh
        # program shape for nearly every page layout, and EVERY shape pays
        # a 5-30 s first-dispatch load per process (plus a 10-30 s compile
        # on cache miss) — a timeline probe showed 10-22 s/page of
        # host_phase_dispatch on varied layouts. Slot exec is ~12 ms/slot
        # and a 1024-vs-2816 buffer saves ~40 ms/group, so the two-point
        # grids capture most of the win at bounded shape count.
        bufH_small = min(1024, capH)

        pending = []
        start = 0
        while start < n:
            B = self.region_batch if n - start > 2 else min(
                2, self.region_batch)
            group = boxes_xywh[start:start + B]
            bufH = (bufH_small if max(b[3] for b in group) <= bufH_small
                    else capH)
            bufW = capW
            boxes_arr = np.zeros((B, 4), np.int32)
            cy = np.full((B, s), -1, np.int32)
            cx = np.full((B, s), -1, np.int32)
            for i, (x, y, w, h) in enumerate(group):
                boxes_arr[i] = (y, x, h, w)
                cy[i], cx[i] = _canvas_index_maps(h, w, s,
                                                  self.cfg.pad_factor)
            compiled, flops = self._aot_resident((H, W), s, bufH, bufW, B)
            t0 = __import__("time").time()
            out_dev = compiled(mask_dev, jnp.asarray(boxes_arr),
                               jnp.asarray(cy), jnp.asarray(cx),
                               jnp.asarray(angles))
            stagetime.add(__import__("time").time() - t0, 0.0)
            pending.append((out_dev, flops, group, bufH))
            start += B
        return pending

    def resident_collect(self, pending):
        """Fetch the results of resident_dispatch (or consume a
        spec_finalize resolution): (slopes, profiles).

        Multi-group pages fetch same-shaped group outputs as ONE
        device->host transfer (a device-side concat enqueued behind the
        groups): each per-group np.asarray costs a full tunnel round
        trip (~35-70 ms latency) on the host phase's critical path, and
        by the time group 0's fetch returns, the later groups have long
        finished executing. Values are unchanged (concat then row-slice
        is the identity)."""
        if isinstance(pending, _SpecResolved):
            return self._spec_collect(pending)
        runs: List[list] = []
        for p in pending:
            out_dev, flops, group, bufH = p
            if getattr(self, "collect_concat", True) and runs \
                    and runs[-1][0][3] == bufH \
                    and runs[-1][0][0].shape[1] == out_dev.shape[1]:
                runs[-1].append(p)
            else:
                runs.append([p])
        slopes: List[float] = []
        profiles = []
        for run in runs:
            flops = sum(p[1] for p in run)
            with stagetime.device_section(flops):
                if len(run) == 1:
                    out = np.asarray(run[0][0])
                else:
                    out = np.asarray(jnp.concatenate([p[0] for p in run]))
            bufH = run[0][3]
            row = 0
            for out_dev, _, group, _ in run:
                for i, (x, y, w, h) in enumerate(group):
                    slopes.append(float(out[row + i, 0]))
                    p1 = out[row + i, 1:1 + h]
                    p0 = out[row + i, 1 + bufH:1 + bufH + w]
                    profiles.append((p1, p0))
                row += out_dev.shape[0]   # this group's slot count
        return slopes, profiles

    # -- speculative path (device region boxes) -------------------------------
    #
    # The serving pipeline's last serialized dependency (round-5 work): the
    # resident deskew dispatch for page N used to wait for N's packed blob
    # FETCH (~20 MB/s tunnel) plus host contour tracing before
    # host_phase_dispatch could enqueue it. The speculative program instead
    # reads the fused segmentation program's own outputs in HBM: it unpacks
    # the packed region canvas, labels components and takes the first
    # `slots` bounding boxes ON DEVICE (ops/cc.component_boxes_topk — the
    # device analogue of main.py:465-481's boundingRect + area filter, with
    # DEVIATIONS #12 pixel-count-area semantics), renders their sweep
    # canvases through in-graph index maps, and runs the full resident
    # chain — dispatched back-to-back with the segmentation program, BEFORE
    # the blob fetch. The host later matches its contour boxes against the
    # device boxes BY VALUE: a slot is trusted only when the box quadruple
    # is identical and the in-graph canvas maps equal the host maps, which
    # makes a matched slot bit-exact with the ordinary resident path (the
    # chain's values are independent of slot count and buffer size — see
    # _resident_chain). Everything unmatched falls back to the ordinary
    # dispatch. See DEVIATIONS #16.

    def spec_canvas(self) -> int:
        """The speculative sweep's static canvas bucket: the largest
        bucket the engine can pick (pages whose regions are all small
        enough that _bucket_for_sizes picks a smaller one fall back —
        scores are canvas-dependent, so a bucket mismatch is a value
        mismatch)."""
        return next((b for b in reversed(_BUCKETS) if b <= self.max_canvas),
                    self.max_canvas)

    def spec_buffer_shape(self, mask_shape) -> Tuple[int, int]:
        """Static crop buffer of the speculative program: one shape only
        (the program is dispatched before region sizes are known).
        Height is capped at 1024 — taller regions fall back to the
        ordinary dispatch, which right-sizes per group; a capH-sized
        speculative buffer would pay the tall-buffer projection cost for
        EVERY region on every page (~40 ms/group measured, PERF.md)."""
        capH, capW = self.resident_buffer_shape(mask_shape)
        return min(1024, capH), capW

    def _aot_spec(self, blob_len: int, packed_nbytes: int, big_hw,
                  slots: int):
        """AOT-compile (once per shape) the speculative program:
        packed blob -> unpack -> crop-mask -> CC top-k boxes -> in-graph
        canvas maps -> _resident_chain; output rows are
        [box5 | slope | row profile | col profile]."""
        cfg = self.cfg
        s = self.spec_canvas()
        bufH, bufW = self.spec_buffer_shape(big_hw)
        B = slots
        ac_n = self._coarse.shape[0]
        av_n = self._vertical.shape[0]
        a_all = ac_n + av_n
        f = B * a_all
        chunk = min(self.chunk, f)
        f_pad = ((f + chunk - 1) // chunk) * chunk
        use_pallas = self.use_pallas
        if use_pallas is None:
            from sbb_textline_detection_tpu.ops import pallas_radon
            use_pallas = (jax.default_backend() == "tpu"
                          and pallas_radon.supported(s))
        use_pallas = bool(use_pallas)
        key = ("spec", blob_len, packed_nbytes, tuple(big_hw), B, s,
               bufH, bufW, ac_n, av_n, chunk, use_pallas,
               float(cfg.sigma), float(cfg.peak_threshold_multiplier),
               float(cfg.pos_peak_min_value),
               float(cfg.vertical_trigger_angle),
               float(cfg.slope_reject_abs), float(cfg.pad_factor),
               bool(cfg.vertical_resweep_guard),
               self._erode_k, self._erode_it, self._morph_k)
        entry = _AOT_CACHE.get(key)
        if entry is not None:
            return entry
        with _AOT_LOCK:
            return self._spec_fn_locked(key, blob_len, packed_nbytes,
                                        big_hw, B, s, bufH, bufW, ac_n,
                                        a_all, f, f_pad, chunk, use_pallas)

    def _spec_fn_locked(self, key, blob_len, packed_nbytes, big_hw, B, s,
                        bufH, bufW, ac_n, a_all, f, f_pad, chunk,
                        use_pallas):
        entry = _AOT_CACHE.get(key)
        if entry is not None:
            return entry
        from sbb_textline_detection_tpu.ops import cc as cc_ops
        from sbb_textline_detection_tpu.ops import pack as pack_ops

        cfg = self.cfg
        H, W = big_hw
        erode_eff = (self._erode_k - 1) * self._erode_it + 1
        morph_k = self._morph_k
        ridx = np.repeat(np.arange(B), a_all)
        aidx = np.tile(np.arange(a_all), B)
        ridx = np.concatenate([ridx, np.zeros(f_pad - f, np.int64)])
        aidx = np.concatenate([aidx, np.zeros(f_pad - f, np.int64)])
        # target_table[m] = int(m * pad_factor): host-built so the
        # downscale trigger is bit-exact with _canvas_index_maps
        ttable = (np.arange(max(H, W) + 1, dtype=np.float64)
                  * float(cfg.pad_factor)).astype(np.int32)

        def fn(blob, mask, hw, amin, amax, angles):
            region = pack_ops.unpack1_device(blob[:packed_nbytes], (H, W))
            ins = ((jnp.arange(H, dtype=jnp.int32)[:, None] < hw[0])
                   & (jnp.arange(W, dtype=jnp.int32)[None, :] < hw[1]))
            # outside-crop canvas pixels are white-tile predictions the
            # host never sees (it slices [:h, :w]); without this mask
            # they would mint phantom components or merge across the
            # crop border
            m = jnp.where(ins, region, 0)
            boxes5 = cc_ops.component_boxes_topk(m, B, amin, amax)
            tt = jnp.asarray(ttable)
            cy, cx = jax.vmap(
                lambda b: _canvas_maps_graph(b[2], b[3], s, tt))(boxes5)
            out = _resident_chain(
                mask, boxes5[:, :4], cy, cx, angles, B=B, ac_n=ac_n, f=f,
                ridx=ridx, aidx=aidx, s=s, chunk=chunk,
                use_pallas=use_pallas, cfg=cfg, erode_eff=erode_eff,
                morph_k=morph_k, bufH=bufH, bufW=bufW)
            # box values ride in the output rows (< 2^24: exact in f32)
            return jnp.concatenate([boxes5.astype(jnp.float32), out],
                                   axis=1)

        blob_ex = jax.ShapeDtypeStruct((blob_len,), jnp.uint8)
        mask_ex = jax.ShapeDtypeStruct((H, W), jnp.uint8)
        hw_ex = jax.ShapeDtypeStruct((2,), jnp.int32)
        a_ex = jax.ShapeDtypeStruct((), jnp.float32)
        ang_ex = jax.ShapeDtypeStruct((a_all,), jnp.float32)
        compiled = jax.jit(fn).lower(blob_ex, mask_ex, hw_ex, a_ex, a_ex,
                                     ang_ex).compile()
        entry = (compiled, stagetime.flops_of(compiled))
        _AOT_CACHE[key] = entry
        return entry

    def spec_dispatch(self, blob_dev, packed_nbytes: int, big_hw,
                      mask_dev, crop_hw, min_area: float, max_area: float,
                      slots: int = 16) -> _SpecPending:
        """Enqueue the speculative resident deskew right behind the fused
        segmentation program whose outputs it reads: `blob_dev` the packed
        1-BIT blob (region canvas bytes first), `mask_dev` the resident
        textline canvas, `crop_hw` the page-crop (h, w), min/max_area the
        PERMISSIVE pixel-count bounds (see component_boxes_topk). Returns
        a _SpecPending for spec_finalize."""
        if tuple(mask_dev.shape) != tuple(big_hw):
            raise ValueError(f"textline canvas {mask_dev.shape} != region "
                             f"canvas {tuple(big_hw)}")
        compiled, flops = self._aot_spec(int(blob_dev.shape[0]),
                                         packed_nbytes, tuple(big_hw),
                                         slots)
        angles = np.concatenate([self._coarse, self._vertical])
        hw = np.asarray(crop_hw, np.int32)
        t0 = __import__("time").time()
        out_dev = compiled(blob_dev, mask_dev, jnp.asarray(hw),
                           jnp.float32(min_area), jnp.float32(max_area),
                           jnp.asarray(angles))
        stagetime.add(__import__("time").time() - t0, 0.0)
        bufH, bufW = self.spec_buffer_shape(big_hw)
        return _SpecPending(out_dev, flops, self.spec_canvas(), bufH, bufW,
                            slots, mask_dev)

    def spec_finalize(self, pending: _SpecPending, boxes_xywh):
        """Match the host contour boxes against the speculative device
        boxes and return a handle for resident_collect. A region uses its
        speculative slot only when (a) the page's canvas bucket equals the
        speculative one, (b) the box fits the speculative crop buffer,
        (c) the in-graph canvas maps equal the host maps for its (h, w),
        and (d) a valid device slot holds the IDENTICAL box quadruple —
        together these make the slot bit-exact with resident_dispatch's
        result for that box. Everything else is served by an ordinary
        fallback dispatch. Raises ValueError exactly where
        resident_dispatch would (region exceeds the resident buffer)."""
        boxes_xywh = [list(map(int, b)) for b in boxes_xywh]
        n = len(boxes_xywh)
        if n == 0:
            return []
        H, W = pending.mask_dev.shape
        capH, capW = self.resident_buffer_shape((H, W))
        for x, y, w, h in boxes_xywh:
            if h > capH or w > capW:
                raise ValueError(
                    f"region {h}x{w} exceeds the resident deskew buffer "
                    f"{capH}x{capW}; host path required")
        s_host = self._bucket_for_sizes([(b[3], b[2]) for b in boxes_xywh])
        if s_host != pending.s:
            # canvas-bucket mismatch is a VALUE mismatch (scores are
            # canvas-dependent): the whole page falls back
            return self.resident_dispatch(pending.mask_dev, boxes_xywh)
        with stagetime.device_section(pending.flops):
            out = np.asarray(pending.out_dev)
        dev_boxes = out[:, :5].astype(np.int64)
        mapping = [-1] * n
        used = set()
        for i, (x, y, w, h) in enumerate(boxes_xywh):
            if h > pending.bufH or w > pending.bufW:
                continue
            gm = _canvas_maps_graph_host(h, w, pending.s,
                                         self.cfg.pad_factor)
            hm = _canvas_index_maps(h, w, pending.s, self.cfg.pad_factor)
            if not (np.array_equal(gm[0], hm[0])
                    and np.array_equal(gm[1], hm[1])):
                continue
            for j in range(pending.slots):
                if j in used or dev_boxes[j, 4] == 0:
                    continue
                if (dev_boxes[j, 0] == y and dev_boxes[j, 1] == x
                        and dev_boxes[j, 2] == h and dev_boxes[j, 3] == w):
                    mapping[i] = j
                    used.add(j)
                    break
        fb_idx = [i for i, mj in enumerate(mapping) if mj < 0]
        fallback = (self.resident_dispatch(
            pending.mask_dev, [boxes_xywh[i] for i in fb_idx])
            if fb_idx else None)
        return _SpecResolved(pending, out, mapping, boxes_xywh, fallback)

    def _spec_collect(self, r: _SpecResolved):
        fb_slopes: List[float] = []
        fb_profiles: list = []
        if r.fallback is not None:
            fb_slopes, fb_profiles = self.resident_collect(r.fallback)
        fb = iter(zip(fb_slopes, fb_profiles))
        bufH, bufW = r.pending.bufH, r.pending.bufW
        slopes: List[float] = []
        profiles = []
        for i, (x, y, w, h) in enumerate(r.boxes):
            j = r.mapping[i]
            if j < 0:
                sl, pr = next(fb)
                slopes.append(sl)
                profiles.append(pr)
                continue
            row = r.out[j]
            slopes.append(float(row[5]))
            profiles.append((row[6:6 + h],
                             row[6 + bufH:6 + bufH + w]))
        return slopes, profiles

    # -- compatibility shims used by tests ------------------------------------
    def _canvas(self, crop: np.ndarray) -> Tuple[np.ndarray, int]:
        s = self._bucket_for([crop])
        out = np.zeros((s, s), dtype=np.float32)
        self._canvas_into(crop, out)
        return out, s

    def _sweep(self, canvas: np.ndarray, s: int, angles: np.ndarray) -> float:
        return self._sweep_batched(canvas[None].astype(np.uint8), s,
                                   np.asarray(angles, np.float32))[0][0]

"""Device connected-component labeling (largest-component box).

Purpose: move the page-border box decision (reference main.py:394-404:
threshold -> dilate -> largest contour -> boundingRect) fully on device so
the page-model dispatch needs NO device->host fetch — the box rides as a
(5,) int32 device array straight into the fused segmentation program, and
the host first sees it inside that program's packed blob. On the serving
tunnel every fetch is a ~35-70 ms round trip, so deleting the small-label
fetch shortens each page's device-phase chain by one blocking round trip.

Algorithm: iterative min-label propagation to a fixpoint.

- seed: every foreground pixel starts with its own flat index, background
  holds the sentinel H*W;
- one sweep = per-axis segmented min-scans (forward + backward along rows,
  then columns — a label crosses a whole straight run in ONE sweep, not
  one pixel per iteration) plus a 3x3 window min for the diagonal links of
  8-connectivity (matching the host oracle `ops/contours.label_components`
  and cv2's contour connectivity);
- `lax.while_loop` until no label changes: the iteration count is the
  number of "bends" in the worst component (2-4 for real page masks), not
  the geodesic diameter.

The final label of each component is the flat index of its topmost-
leftmost pixel. Areas are PIXEL COUNTS (one `bincount` over the label
map); the host oracle ranks exterior contours by their shoelace polygon
area (main.py:85-87). The two rankings agree unless two near-equal-area
candidates differ via boundary/hole accounting — see DEVIATIONS.md (the
page-box entry) and the parity test in tests/test_cc.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _shift_fill(x: jax.Array, d: int, axis: int, reverse: bool, fill):
    """`x` shifted by `d` along `axis` toward the scan direction (forward
    scan reads from d EARLIER positions), vacated entries = `fill`."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if reverse:
        pad[axis] = (0, d)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(d, d + n)
    else:
        pad[axis] = (d, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _seg_min_scan(m: jax.Array, g: jax.Array, axis: int,
                  reverse: bool) -> jax.Array:
    """Segmented running min along `axis`: position p receives the min of
    `m` over the contiguous True-run of `g` ending at p (from the scan
    direction). m: int32 with sentinel at ~g; g: bool.

    Implemented as an explicit Hillis-Steele doubling loop (log2(n)
    shift+where steps) rather than `lax.associative_scan`: the scan
    primitive at page-canvas lengths (~2-3k) compiled pathologically
    slowly on the serving TPU backend (>9 min observed for this op alone
    vs 14 s for the whole program on XLA:CPU — PERF.md round-5). The
    combine ((v,g) pairs: v' = g_b ? min(v_b, v_a) : v_b, g' = g_a & g_b)
    is associative, so the doubling recurrence computes the identical
    fixpoint; out-of-range neighbors use the operator identity
    (+inf-like sentinel, True)."""
    v, f = m, g
    n = m.shape[axis]
    big = np.int32(2 ** 30)
    d = 1
    while d < n:
        pv = _shift_fill(v, d, axis, reverse, big)
        pf = _shift_fill(f, d, axis, reverse, True)
        v = jnp.where(f, jnp.minimum(v, pv), v)
        f = f & pf
        d *= 2
    return v


def _cumsum_flat_i32(x: jax.Array) -> jax.Array:
    """Inclusive cumsum of a flat int32 array by the same doubling
    scheme (see _seg_min_scan on why not lax/cumsum: jnp.cumsum lowers
    through the same scan machinery on this backend)."""
    v = x
    n = x.shape[0]
    d = 1
    while d < n:
        v = v + jnp.pad(v, (d, 0))[:n]
        d *= 2
    return v


def label_components(mask: jax.Array) -> jax.Array:
    """8-connected component labels of `mask != 0` on device.

    Returns (H, W) int32: each foreground pixel holds its component's
    minimal flat index; background holds H*W. Device twin of
    `ops/contours.label_components` (host/native) up to the label values
    (host assigns dense 1..n ids; both induce the same partition)."""
    import numpy as np

    fg = mask != 0
    h, w = mask.shape
    big = np.int32(h * w)  # concrete: reduce_window's init must not trace
    iota = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(fg, iota, big)

    def sweep(lab):
        for axis in (1, 0):
            fwd = _seg_min_scan(lab, fg, axis, False)
            bwd = _seg_min_scan(lab, fg, axis, True)
            lab = jnp.where(fg, jnp.minimum(fwd, bwd), big)
        # diagonal links (8-connectivity): 3x3 neighborhood min
        n3 = jax.lax.reduce_window(lab, big, jax.lax.min, (3, 3), (1, 1),
                                   ((1, 1), (1, 1)))
        return jnp.where(fg, jnp.minimum(lab, n3), big)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = sweep(lab)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(cond, body, (sweep(lab0), jnp.bool_(True)))
    return lab


def component_boxes_topk(mask: jax.Array, k: int,
                         min_area: jax.Array,
                         max_area: jax.Array) -> jax.Array:
    """Bounding boxes of the first `k` 8-connected components of
    `mask != 0` in row-major scan order, filtered by PIXEL-COUNT area in
    [min_area, max_area] (traced f32 scalars).

    Device analogue of the host region-contour stage's boundingRect + area
    filter (reference main.py:465-481 via stages.region_contours_and_boxes)
    for the speculative deskew dispatch: the bbox of a component always
    equals the boundingRect of its exterior contour, but the AREA here is
    the pixel count, not the traced polygon's shoelace area
    (DEVIATIONS #12 semantics) — callers therefore pass a PERMISSIVE
    min_area and re-verify each box against the host contour boxes before
    trusting results derived from it.

    Returns (k, 5) int32 rows [y, x, h, w, valid], filter-passing
    components compacted to the front in scan order; invalid rows are
    all-zero. Components beyond the first k (by scan order of their
    topmost-leftmost pixel) are simply absent."""
    h, w = mask.shape
    lab = label_components(mask)
    iota = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    # a pixel is its component's representative iff its label is its own
    # flat index; the rank of a rep in the cumsum of the rep indicator is
    # its component's row-major scan-order index. (rank-gather instead of
    # lax.top_k over h*w elements — same backend-compile concern as
    # _seg_min_scan.)
    is_rep = (lab == iota).reshape(-1)
    rank_incl = _cumsum_flat_i32(is_rep.astype(jnp.int32))
    # per-pixel slot = scan rank of its component (gather via lab, which
    # IS the rep's flat index); background / beyond-first-k -> dump bin k
    slot = jnp.where(mask.reshape(-1) != 0,
                     rank_incl[lab.reshape(-1)] - 1, k)
    slot = jnp.minimum(slot, k).reshape(h, w)
    found = (jnp.arange(k) < rank_incl[-1])
    hit = slot[None, :, :] == jnp.arange(k)[:, None, None]   # (k, h, w)
    area = hit.sum(axis=(1, 2)).astype(jnp.int32)
    rows = jnp.any(hit, axis=2)                       # (k, h)
    cols = jnp.any(hit, axis=1)                       # (k, w)
    ys = jnp.arange(h, dtype=jnp.int32)[None, :]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    y0 = jnp.min(jnp.where(rows, ys, h), axis=1)
    y1 = jnp.max(jnp.where(rows, ys, -1), axis=1)
    x0 = jnp.min(jnp.where(cols, xs, w), axis=1)
    x1 = jnp.max(jnp.where(cols, xs, -1), axis=1)
    af = area.astype(jnp.float32)
    ok = found & (af >= min_area) & (af <= max_area)
    box = jnp.stack([y0, x0, y1 - y0 + 1, x1 - x0 + 1,
                     ok.astype(jnp.int32)], axis=1)
    box = jnp.where(ok[:, None], box, 0)
    # compact passing components to the front, preserving scan order (a
    # filtered-out speck must not occupy a sweep slot a real region needs)
    seq = jnp.arange(k, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(ok, seq, k + seq))
    return box[order].astype(jnp.int32)


def largest_component_box(mask: jax.Array
                          ) -> Tuple[jax.Array, jax.Array]:
    """Bounding box of the largest (pixel-count) 8-connected component.

    Returns ((4,) int32 [x, y, w, h] — `cv2.boundingRect` convention, the
    same layout as `ops/contours.bounding_rect` — and a bool scalar
    `valid` (False when the mask is empty; the box is then all-zero and
    the caller must fall back, like the host path's except at
    main.py:406-426 / stages.extract_page)."""
    h, w = mask.shape
    lab = label_components(mask)
    flat = lab.reshape(-1)
    counts = jnp.zeros(h * w + 1, jnp.int32).at[flat].add(1)
    counts = counts.at[h * w].set(0)  # background sentinel
    best = jnp.argmax(counts).astype(jnp.int32)
    valid = counts[best] > 0
    hit = lab == best
    rows = jnp.any(hit, axis=1)
    cols = jnp.any(hit, axis=0)
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    y0 = jnp.min(jnp.where(rows, ys, h)).astype(jnp.int32)
    y1 = jnp.max(jnp.where(rows, ys, -1)).astype(jnp.int32)
    x0 = jnp.min(jnp.where(cols, xs, w)).astype(jnp.int32)
    x1 = jnp.max(jnp.where(cols, xs, -1)).astype(jnp.int32)
    box = jnp.where(valid,
                    jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]),
                    jnp.zeros(4, jnp.int32))
    return box, valid

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
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sbb_textline_detection_tpu.core.config import DeskewConfig
from sbb_textline_detection_tpu.ops import profiles
from sbb_textline_detection_tpu.ops import resize as resize_ops

_BUCKETS = (256, 512, 1024, 1536, 2048)


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


@functools.partial(jax.jit, static_argnames=("s",))
def _radon_profiles(canvas: jax.Array, angles: jax.Array, s: int) -> jax.Array:
    """(S, S) binary canvas + (A,) angles (deg) -> (A, S) projections."""
    c = float(s // 2)
    idx = jnp.arange(s, dtype=jnp.float32)
    canvas = canvas.astype(jnp.float32)

    def one(_, ang):
        rad = jnp.deg2rad(ang)
        a = jnp.cos(rad)
        b = jnp.sin(rad)
        # A[q, y] = hat(q - (a*(y-c) + c))
        fy = a * (idx - c) + c
        A = _hat(idx[:, None] - fy[None, :])
        # B[u, x] = hat(u - (-b*(x-c) + s//2))
        gx = -b * (idx - c) + float(s // 2)
        B = _hat(idx[:, None] - gx[None, :])
        U = A @ canvas @ B.T
        # anti-diagonal sums via pad/reshape: G[t, k] = U[t, k - t]
        L = 2 * s
        W = jnp.pad(U, ((0, 0), (0, L - s)))
        flat = W.reshape(-1)[: s * (L - 1)].reshape(s, L - 1)
        D = flat.sum(axis=0)                      # D[k] = sum_t U[t, k-t]
        return None, jax.lax.dynamic_slice(D, (s // 2,), (s,))

    _, P = jax.lax.scan(one, None, angles)
    return P


@functools.partial(jax.jit, static_argnames=("sigma", "multiplier", "pos_min"))
def _score_profiles(P: jax.Array, sigma: float = 2.0,
                    multiplier: float = 20.3, pos_min: float = 10.0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Per-angle (valid, score) from (A, S) projections."""
    a, s_len = P.shape
    z = profiles.gaussian_filter1d(P, sigma)

    y_help = jnp.pad(P, ((0, 0), (10, 10)))
    zneg_rev = jnp.max(y_help, axis=-1, keepdims=True) - y_help
    zneg = jnp.pad(zneg_rev, ((0, 0), (10, 10)))
    zneg = profiles.gaussian_filter1d(zneg, sigma)      # (A, S+40)

    pmask = profiles.peak_mask(z)
    nmask = profiles.peak_mask(zneg)

    pos_sel = pmask & (z > pos_min)
    pos_cnt = pos_sel.sum(axis=-1)
    mpp = jnp.where(pos_cnt > 0,
                    (z * pos_sel).sum(axis=-1) / jnp.maximum(pos_cnt, 1), jnp.nan)
    grenze = mpp - mpp / multiplier                      # (A,)

    q = jnp.arange(s_len + 40) - 20                      # z-index per zneg pos
    oob = nmask & (q[None, :] >= s_len)
    any_oob = oob.any(axis=-1)
    zq = jnp.take(z, q % s_len, axis=-1)                 # numpy wrap semantics
    neg_sel = nmask & (zq < grenze[:, None])
    neg_cnt = neg_sel.sum(axis=-1)

    var = jnp.std(z, axis=-1)
    valid = (pos_cnt > 0) & (neg_cnt > 0) & ~any_oob
    # upstream: an indexing error is caught and the angle is kept with
    # variance 0 (main.py:1647-1650)
    score = jnp.where(any_oob, 0.0, var)
    return valid | any_oob, score


class DeskewEngine:
    """Batched deskew sweeps with canvas-size bucketing."""

    def __init__(self, cfg: DeskewConfig = DeskewConfig(),
                 max_canvas: int = 2048):
        self.cfg = cfg
        self.max_canvas = max_canvas
        self._coarse = np.linspace(cfg.coarse_range[0], cfg.coarse_range[1],
                                   cfg.coarse_steps).astype(np.float32)
        self._vertical = np.linspace(cfg.vertical_range[0],
                                     cfg.vertical_range[1],
                                     cfg.vertical_steps).astype(np.float32)

    def _canvas(self, crop: np.ndarray) -> Tuple[np.ndarray, int]:
        h, w = crop.shape
        target = int(max(h, w) * self.cfg.pad_factor)
        target = max(target, 32)
        s = next((b for b in _BUCKETS if b >= target and b <= self.max_canvas),
                 self.max_canvas)
        if target > s:
            scale = s / float(target)
            nh = max(1, int(h * scale))
            nw = max(1, int(w * scale))
            crop = resize_ops.resize_nearest_host(crop, nh, nw)
            h, w = nh, nw
        canvas = np.zeros((s, s), dtype=np.float32)
        cp = s // 2
        y0 = cp - h // 2
        x0 = cp - w // 2
        canvas[y0:y0 + h, x0:x0 + w] = (crop != 0).astype(np.float32)
        return canvas, s

    def _sweep(self, canvas: np.ndarray, s: int, angles: np.ndarray) -> float:
        P = _radon_profiles(jnp.asarray(canvas), jnp.asarray(angles), s)
        valid, score = _score_profiles(
            P, sigma=float(self.cfg.sigma),
            multiplier=float(self.cfg.peak_threshold_multiplier),
            pos_min=float(self.cfg.pos_peak_min_value))
        valid = np.asarray(valid)
        score = np.asarray(score)
        compact = score[valid]
        if compact.size == 0:
            return 0.0  # upstream: argmax of empty raises -> except -> 0
        return float(angles[valid][int(np.argmax(compact))])

    def best_angle(self, crop: np.ndarray) -> float:
        """Reference return_deskew_slope (main.py:1601-1718): coarse sweep
        [-25, 25]; if |angle| > 15, re-sweep [-90, -50] for vertical text."""
        canvas, s = self._canvas(crop)
        ang = self._sweep(canvas, s, self._coarse)
        if abs(ang) > self.cfg.vertical_trigger_angle:
            ang = self._sweep(canvas, s, self._vertical)
        return ang

"""1-D projection-profile ops: Gaussian smoothing and peak finding.

The reference leans on `scipy.ndimage.gaussian_filter1d` and
`scipy.signal.find_peaks` for every projection-profile heuristic
(line splitting main.py:548-629, deskew scoring main.py:1573-1578,
reading order main.py:1811-1825 of the upstream repo).

This module owns both:
  * exact host (numpy) implementations — the parity oracle, also used on the
    host-side heuristic path, and
  * fixed-shape JAX implementations for the device path (batched deskew
    scoring), where profiles are padded to static lengths and peaks are
    returned as boolean masks instead of index lists.

The JAX peak finder is plateau-aware with scipy's midpoint convention:
Gaussian smoothing does NOT dissolve wide plateaus (a constant run farther
than the kernel radius from any transition stays exactly constant), and
sharply deskewed projection profiles are full of them — strict-neighbor
masks would report zero peaks exactly at the best angles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host (numpy) — exact parity with scipy semantics.
# ---------------------------------------------------------------------------

def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Normalized Gaussian taps, bit-identical to scipy's _gaussian_kernel1d
    (integer x**2 scaled by -0.5/sigma**2 — the op order matters for
    downstream find_peaks tie-breaking)."""
    sigma = float(sigma)
    radius = int(truncate * sigma + 0.5)
    sigma2 = sigma * sigma
    x = np.arange(-radius, radius + 1)
    w = np.exp(-0.5 / sigma2 * x ** 2)
    return w / w.sum()


def gaussian_filter1d_host(y: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d BIT-exact equivalent (mode='reflect').

    Matches scipy's ni_correlate1d symmetric-kernel path: center tap first,
    then (left + right) * weight pairs added farthest-first. Exactness
    matters: the line separator's find_peaks runs on these profiles, and a
    1-ulp difference at a plateau moves a peak index (tests/test_lines_oracle
    compares box-for-box against a scipy-based transcription).
    """
    y = np.asarray(y, dtype=np.float64)
    w = gaussian_kernel1d(sigma, truncate)
    radius = (len(w) - 1) // 2
    if radius == 0:
        return y.copy()
    n = y.shape[0]
    # scipy 'reflect' == numpy 'symmetric' (edge value repeated):  d c b a | a b c d
    ypad = np.pad(y, radius, mode="symmetric")
    from sbb_textline_detection_tpu import native_bridge

    if native_bridge.available():
        # same farthest-first accumulation in C (bit-exact; the Makefile
        # builds sbb_native.cpp with -ffp-contract=off) without ~radius
        # numpy passes
        out = native_bridge.correlate1d_sym(ypad, n, w)
        if out is not None:
            return out
    out = ypad[radius:radius + n] * w[radius]
    for j in range(radius, 0, -1):
        out += (ypad[radius - j:radius - j + n]
                + ypad[radius + j:radius + j + n]) * w[radius - j]
    return out


def local_maxima_host(y: np.ndarray) -> np.ndarray:
    """Plateau-aware local maxima, midpoint convention — matches
    scipy.signal._peak_finding_utils._local_maxima_1d exactly.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 3:
        return np.empty(0, dtype=np.int64)
    # Run-length encode so plateaus collapse to single candidates.
    change = np.flatnonzero(np.diff(y) != 0) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))  # exclusive
    vals = y[starts]
    if starts.size < 3:
        return np.empty(0, dtype=np.int64)
    mid = vals[1:-1]
    is_peak = (mid > vals[:-2]) & (mid > vals[2:])
    runs = np.arange(1, starts.size - 1)[is_peak]
    left = starts[runs]
    right = ends[runs] - 1
    return left + (right - left) // 2


def find_peaks_host(y: np.ndarray, height: float | None = None) -> np.ndarray:
    """scipy.signal.find_peaks(y, height=height)[0] equivalent."""
    peaks = local_maxima_host(y)
    if height is not None and peaks.size:
        y = np.asarray(y, dtype=np.float64)
        peaks = peaks[y[peaks] >= height]
    return peaks


# ---------------------------------------------------------------------------
# Device (JAX) — fixed shapes, mask-based peaks.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_filter1d(y: jax.Array, sigma: float, truncate: float = 4.0) -> jax.Array:
    """Batched Gaussian smoothing along the last axis, reflect boundary.

    Accepts (..., N); returns float32 of the same shape.
    """
    w = jnp.asarray(gaussian_kernel1d(sigma, truncate), dtype=jnp.float32)
    radius = (w.shape[0] - 1) // 2
    y = y.astype(jnp.float32)
    if radius == 0:
        return y
    lead = y.shape[:-1]
    n = y.shape[-1]
    if radius > n:
        raise ValueError(f"gaussian radius {radius} exceeds profile length {n}")
    flat = y.reshape((-1, 1, n))
    # 'symmetric' reflect padding:  d c b a | a b c d | d c b a
    flipped = jnp.flip(flat, axis=-1)
    padded = jnp.concatenate(
        [flipped[..., -radius:], flat, flipped[..., :radius]], axis=-1
    )
    out = jax.lax.conv_general_dilated(
        padded,
        w.reshape(1, 1, -1),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (n,))


@jax.jit
def peak_mask(y: jax.Array) -> jax.Array:
    """Plateau-aware local-maximum mask along the last axis.

    Matches scipy.signal._local_maxima_1d (and local_maxima_host above): a
    maximal constant run is a peak iff the adjacent values on both sides are
    strictly lower; the mask is set at the run's midpoint
    ``left + (right - left) // 2``. Runs touching either border are not
    peaks. Vectorized via cumulative max/min over change-point indices.
    """
    y = y.astype(jnp.float32)
    n = y.shape[-1]
    if n < 3:
        return jnp.zeros(y.shape, dtype=bool)
    d = y[..., 1:] - y[..., :-1]                      # (..., n-1)
    nz = d != 0
    idx = jnp.arange(n - 1)
    shape1 = y.shape[:-1] + (1,)
    # prev[i]: index of the last nonzero diff strictly before position i
    prev_c = jax.lax.cummax(jnp.where(nz, idx, -1), axis=y.ndim - 1)
    prev = jnp.concatenate(
        [jnp.full(shape1, -1, prev_c.dtype), prev_c], axis=-1)
    # nxt[i]: index of the first nonzero diff at/after position i
    nxt_c = jax.lax.cummin(jnp.where(nz, idx, n), axis=y.ndim - 1,
                           reverse=True)
    nxt = jnp.concatenate(
        [nxt_c, jnp.full(shape1, n, nxt_c.dtype)], axis=-1)
    d_prev = jnp.take_along_axis(d, jnp.clip(prev, 0, n - 2), axis=-1)
    d_next = jnp.take_along_axis(d, jnp.clip(nxt, 0, n - 2), axis=-1)
    rising = (prev >= 0) & (d_prev > 0)
    falling = (nxt <= n - 2) & (d_next < 0)
    mid = (prev + 1 + nxt) // 2                       # plateau = [prev+1, nxt]
    return rising & falling & (jnp.arange(n) == mid)

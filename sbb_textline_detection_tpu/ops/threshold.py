"""Otsu thresholding — replaces cv2.threshold(..., THRESH_BINARY+THRESH_OTSU).

Reference call sites: otsu_copy (main.py:178-194 upstream), which computes an
Otsu threshold per channel but — preserving the upstream behavior exactly —
writes *channel 0's* thresholded result into all three output channels
(main.py:191-193).

cv2's getThreshVal_Otsu_8u maximizes the between-class variance over the 256
histogram bins, keeping the *first* maximizer; THRESH_BINARY maps
value > threshold → 255, else 0. The host path replicates this
bit-for-bit for uint8 input (float64 scoring like cv2). The device path
scores in float32 (TPU has no fast f64): on a histogram where two
candidate thresholds' between-class variances agree to within f32
resolution (~1e-7 relative), the argmax can pick a later bin than cv2's
first-max rule — a measure-zero near-tie case the parity tests have
never hit; everywhere else the device threshold equals the host one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def otsu_threshold_host(img: np.ndarray) -> int:
    """Otsu threshold of a uint8 array (any shape); cv2-equivalent."""
    hist = np.bincount(np.asarray(img, dtype=np.uint8).ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    p = hist / total
    omega = np.cumsum(p)                      # w0(t) for t = 0..255
    mu_t = np.cumsum(p * np.arange(256))      # first moment up to t
    mu = mu_t[-1]
    w0 = omega
    w1 = 1.0 - omega
    valid = (w0 > 0) & (w1 > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = mu_t / w0
        mu1 = (mu - mu_t) / w1
        sigma_b = w0 * w1 * (mu0 - mu1) ** 2
    sigma_b = np.where(valid, sigma_b, -1.0)
    return int(np.argmax(sigma_b))  # first max — matches cv2's strict '>' update


def otsu_binarize_host(img: np.ndarray) -> np.ndarray:
    """THRESH_BINARY+THRESH_OTSU: (img > t) * 255, uint8."""
    t = otsu_threshold_host(img)
    return np.where(np.asarray(img) > t, 255, 0).astype(np.uint8)


def otsu_copy_host(img: np.ndarray) -> np.ndarray:
    """Reference `otsu_copy`: all 3 output channels get channel 0's binarization.

    Upstream computes thresholds for all three channels but assigns
    `threshold1` to every channel (main.py:187-193); we preserve that
    observable behavior (channel-0 threshold only).
    """
    ch0 = otsu_binarize_host(img[..., 0])
    return np.repeat(ch0[..., None], 3, axis=-1)


# ---------------------------------------------------------------------------
# Device (JAX)
# ---------------------------------------------------------------------------

def _hist256_weighted(flat_i32: jax.Array, weight_f: jax.Array) -> jax.Array:
    """Weighted 256-bin histogram as a nibble one-hot matmul.

    A scatter-add (`.at[idx].add`) serializes on the TPU (~90 ms for a
    10 M-pixel page); instead split each byte into hi/lo nibbles and
    accumulate the (16, 16) outer-product table on the MXU:
    hist[hi*16+lo] = sum_p w_p * [hi_p==hi] * [lo_p==lo]. One-hots and
    weights are exact in bf16 (values 0/1); the f32 MXU accumulator is
    exact for counts < 2^24, far above any page's pixel count."""
    n = flat_i32.shape[0]
    chunk = 1 << 19  # bounds the transient (chunk, 16) one-hots to ~32 MB
    n_pad = -(-n // chunk) * chunk
    v = jnp.zeros((n_pad,), jnp.int32).at[:n].set(flat_i32)
    w = jnp.zeros((n_pad,), jnp.bfloat16).at[:n].set(
        weight_f.astype(jnp.bfloat16))
    nib = jnp.arange(16, dtype=jnp.int32)

    def body(acc, vw):
        vv, ww = vw
        oh_hi = ((vv[:, None] >> 4) == nib).astype(jnp.bfloat16) * ww[:, None]
        oh_lo = ((vv[:, None] & 15) == nib).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            oh_hi, oh_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((16, 16), jnp.float32),
                          (v.reshape(-1, chunk), w.reshape(-1, chunk)))
    return acc.reshape(256)


@jax.jit
def otsu_threshold(img: jax.Array) -> jax.Array:
    """Otsu threshold (int32 scalar) of a uint8 image on device."""
    flat = img.astype(jnp.int32).ravel()
    hist = _hist256_weighted(flat, jnp.ones_like(flat, jnp.float32))
    return _otsu_from_hist(hist)


@jax.jit
def otsu_threshold_masked(img: jax.Array, weight: jax.Array) -> jax.Array:
    """Otsu threshold over only the pixels where `weight` is nonzero.

    Lets one compiled program handle any original-image extent inside a
    padded canvas: the scope of the histogram (the reference computes the
    threshold over the unpadded page, main.py:187-189) becomes a runtime
    mask instead of a static slice shape."""
    flat = img.astype(jnp.int32).ravel()
    hist = _hist256_weighted(flat, weight.astype(jnp.float32).ravel())
    return _otsu_from_hist(hist)


def _otsu_from_hist(hist: jax.Array) -> jax.Array:
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    omega = jnp.cumsum(p)
    mu_t = jnp.cumsum(p * jnp.arange(256, dtype=jnp.float32))
    mu = mu_t[-1]
    w0 = omega
    w1 = 1.0 - omega
    valid = (w0 > 0) & (w1 > 0)
    mu0 = mu_t / jnp.where(w0 > 0, w0, 1.0)
    mu1 = (mu - mu_t) / jnp.where(w1 > 0, w1, 1.0)
    sigma_b = jnp.where(valid, w0 * w1 * (mu0 - mu1) ** 2, -1.0)
    return jnp.argmax(sigma_b).astype(jnp.int32)


@jax.jit
def otsu_copy(img: jax.Array) -> jax.Array:
    """Device `otsu_copy` (see host docstring). img: (H, W, 3) uint8."""
    t = otsu_threshold(img[..., 0])
    ch0 = jnp.where(img[..., 0].astype(jnp.int32) > t, 255, 0).astype(jnp.uint8)
    return jnp.repeat(ch0[..., None], 3, axis=-1)

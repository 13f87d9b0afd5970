"""Grayscale morphology with a flat rectangular structuring element.

Replaces the reference's cv2.dilate / cv2.erode / cv2.morphologyEx call
sites (main.py:397, 463-464, 1478-1479, 1734, 2074-2075 upstream).

cv2 semantics reproduced here:
  * flat all-ones k×k kernel, anchor at center;
  * `iterations=n` of a k×k flat SE equals one pass with an
    ((k-1)·n + 1)-sized SE (exact for flat rectangular SEs);
  * border handling: dilate pads with -inf (the image border never dilates
    inward from outside), erode pads with +inf.

Device path uses `lax.reduce_window` (fuses well under XLA); the host path
is a numpy sliding-window used by the oracle/tests and tiny crops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _effective_size(kernel_size: int, iterations: int) -> int:
    return (kernel_size - 1) * iterations + 1


# ---------------------------------------------------------------------------
# Device (JAX)
# ---------------------------------------------------------------------------

def _window_reduce(img, k, op, init):
    """Separable rectangular window reduce: two 1-D passes (k+k work per
    pixel instead of k*k — a flat rectangular SE is separable).

    uint8 inputs (the label/binary masks every pipeline call site passes)
    compute in bfloat16: min/max over integers <= 256 is exact in bf16
    (8 mantissa bits), and these full-canvas passes are HBM-bandwidth
    bound — bf16 moves half the bytes f32 did. Other dtypes keep f32."""
    orig_dtype = img.dtype
    ct = jnp.bfloat16 if img.dtype == jnp.uint8 else jnp.float32
    x = img.astype(ct)
    init = jnp.asarray(init, ct)
    expand = x.ndim == 2
    if expand:
        x = x[..., None]
    pad = k // 2
    x = jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(k, 1, 1), window_strides=(1, 1, 1),
        padding=((pad, pad), (0, 0), (0, 0)))
    x = jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(1, k, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (0, 0)))
    if expand:
        x = x[..., 0]
    return x.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("kernel_size", "iterations"))
def dilate(img: jax.Array, kernel_size: int = 5, iterations: int = 1) -> jax.Array:
    """Max filter over the leading two axes (H, W[, C])."""
    k = _effective_size(kernel_size, iterations)
    return _window_reduce(img, k, jax.lax.max, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("kernel_size", "iterations"))
def erode(img: jax.Array, kernel_size: int = 5, iterations: int = 1) -> jax.Array:
    """Min filter over the leading two axes (H, W[, C])."""
    k = _effective_size(kernel_size, iterations)
    return _window_reduce(img, k, jax.lax.min, jnp.inf)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def morph_open(img: jax.Array, kernel_size: int = 5) -> jax.Array:
    return dilate(erode(img, kernel_size), kernel_size)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def morph_close(img: jax.Array, kernel_size: int = 5) -> jax.Array:
    return erode(dilate(img, kernel_size), kernel_size)


# ---------------------------------------------------------------------------
# Host (numpy)
# ---------------------------------------------------------------------------

def _binary_foreground_value(img: np.ndarray):
    """If `img` is 2-D binary (values ⊆ {0, v}), return v; else None.

    O(n) min/max scan — np.unique's full sort cost ~0.4 s/page across the
    ~100 host morphology calls of one page's post-processing."""
    if img.ndim != 2:
        return None
    mx = img.max() if img.size else 0
    if mx == 0:
        return 1  # all-background: any foreground value works
    if np.min(img, initial=mx, where=img != 0) == mx:
        return mx
    return None


def _native_morph(img: np.ndarray, kernel_size: int, iterations: int,
                  dilate_op: bool):
    """Dispatch binary 2-D morphology to the native library; None if not
    applicable (grayscale input or library unavailable)."""
    from sbb_textline_detection_tpu import native_bridge

    if not native_bridge.available():
        return None
    v = _binary_foreground_value(img)
    if v is None:
        return None
    out = native_bridge.morph_binary(img, kernel_size, iterations, dilate_op)
    return (out * np.asarray(v, dtype=img.dtype)).astype(img.dtype)


def _window_reduce_host(img: np.ndarray, k: int, op, pad_value) -> np.ndarray:
    """Separable two-pass host window reduce (flat rectangular SE)."""
    pad = k // 2
    x = img.astype(np.float64)
    expand = x.ndim == 2
    if expand:
        x = x[..., None]
    padded = np.pad(x, ((pad, pad), (0, 0), (0, 0)), constant_values=pad_value)
    win = np.lib.stride_tricks.sliding_window_view(padded, k, axis=0)
    x = op(win, axis=-1)
    padded = np.pad(x, ((0, 0), (pad, pad), (0, 0)), constant_values=pad_value)
    win = np.lib.stride_tricks.sliding_window_view(padded, k, axis=1)
    x = op(win, axis=-1)
    if expand:
        x = x[..., 0]
    return x


def dilate_host(img: np.ndarray, kernel_size: int = 5, iterations: int = 1) -> np.ndarray:
    out = _native_morph(img, kernel_size, iterations, dilate_op=True)
    if out is not None:
        return out
    k = _effective_size(kernel_size, iterations)
    return _window_reduce_host(img, k, np.max, -np.inf).astype(img.dtype)


def erode_host(img: np.ndarray, kernel_size: int = 5, iterations: int = 1) -> np.ndarray:
    out = _native_morph(img, kernel_size, iterations, dilate_op=False)
    if out is not None:
        return out
    k = _effective_size(kernel_size, iterations)
    return _window_reduce_host(img, k, np.min, np.inf).astype(img.dtype)


def morph_seq_host(img: np.ndarray, ops) -> np.ndarray:
    """Apply a sequence of ("erode"|"dilate"|"open"|"close", kernel,
    iterations) passes back to back. For binary 2-D masks this is ONE
    native call (one dtype conversion + one foreground scan for the whole
    chain — a page's post-processing runs ~40 open+close chains); the
    composed host passes are the fallback and the parity oracle."""
    prims = []
    for op, k, it in ops:
        if op in ("erode", "dilate"):
            prims.append((op, k, it))
        elif op == "open":
            # cv2.morphologyEx iteration semantics: erode x it, dilate x it
            prims += [("erode", k, max(1, it)), ("dilate", k, max(1, it))]
        elif op == "close":
            prims += [("dilate", k, max(1, it)), ("erode", k, max(1, it))]
        else:
            raise ValueError(f"unknown morph op {op!r}")
    from sbb_textline_detection_tpu import native_bridge

    if native_bridge.available():
        v = _binary_foreground_value(img)
        if v is not None:
            out = native_bridge.morph_seq(img, prims)
            return (out * np.asarray(v, dtype=img.dtype)).astype(img.dtype)
    x = img
    for op, k, it in prims:
        x = erode_host(x, k, it) if op == "erode" else dilate_host(x, k, it)
    return x


def morph_open_host(img: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    return dilate_host(erode_host(img, kernel_size), kernel_size)


def morph_close_host(img: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    return erode_host(dilate_host(img, kernel_size), kernel_size)

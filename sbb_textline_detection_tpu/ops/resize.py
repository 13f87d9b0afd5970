"""Nearest-neighbor resize with cv2.INTER_NEAREST index semantics.

Replaces cv2.resize(..., interpolation=cv2.INTER_NEAREST) (main.py:112-113
upstream), used for the global page rescale (main.py:214) and for mapping
whole-image label maps back to page size (main.py:378).

cv2's INTER_NEAREST picks src index  floor(dst_index * src/dst) , clipped to
the valid range — note: no +0.5 center offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_indices(dst: int, src: int) -> np.ndarray:
    scale = src / float(dst)
    idx = np.floor(np.arange(dst, dtype=np.float64) * scale).astype(np.int64)
    return np.clip(idx, 0, src - 1)


def resize_nearest_host(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W[, C]) → (out_h, out_w[, C]) uint8/any dtype preserved."""
    ys = _nearest_indices(out_h, img.shape[0])
    xs = _nearest_indices(out_w, img.shape[1])
    if img.dtype == np.uint8 and img.ndim in (2, 3):
        from sbb_textline_detection_tpu import native_bridge

        if native_bridge.available():
            # same gather, single C++ pass (~3x the numpy fancy-indexing
            # throughput on the 1-core serving host); indices computed here
            # so the cv2 INTER_NEAREST semantics stay single-sourced
            return native_bridge.resize_nearest_u8(img, ys, xs)
    return img[np.ix_(ys, xs)] if img.ndim == 2 else img[ys][:, xs]


def compose_nearest_indices(dst: int, mid: int, src: int) -> np.ndarray:
    """Index map of the two-stage resize `resize(resize(x, mid), dst)`
    composed into one gather: row i of the final image is row
    idx_mid_to_src[idx_dst_to_mid[i]] of the source. Exact — nearest
    resizing is a pure gather, so composition is index composition."""
    return _nearest_indices(mid, src)[_nearest_indices(dst, mid)]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    ys = jnp.asarray(_nearest_indices(out_h, img.shape[0]))
    xs = jnp.asarray(_nearest_indices(out_w, img.shape[1]))
    out = jnp.take(img, ys, axis=0)
    return jnp.take(out, xs, axis=1)

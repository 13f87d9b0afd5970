"""Center rotation — replaces cv2.getRotationMatrix2D + cv2.warpAffine.

Reference call sites (upstream main.py:159-163): rotation of textline masks
and rasterized region contours by the deskew slope, with INTER_CUBIC and
BORDER_REPLICATE, about center (w//2, h//2), output size (w, h).

cv2 conventions reproduced:
  * positive angle = counter-clockwise;
  * inverse-map sampling: dst(p) = src(R(-a)·(p - c) + c);
  * bicubic = Keys kernel with A = -0.75; replicate border via index clip.
cv2 runs fixed-point (5-bit) interpolation; we compute in float32, so results
match to ~1/32 of a gray level (tests assert accordingly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weights(f):
    """Keys bicubic weights (A=-0.75) for taps at offsets -1, 0, 1, 2.
    Pure +,*,- arithmetic: serves jax arrays (device path) and numpy
    arrays (host parity oracle) from the one definition."""
    A = -0.75

    def k1(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    return (k2(1.0 + f), k1(f), k1(1.0 - f), k2(2.0 - f))


def _sample(img: jax.Array, sy: jax.Array, sx: jax.Array, order: int) -> jax.Array:
    """Sample img (H, W) at float coords (sy, sx) with replicate border."""
    h, w = img.shape
    flat = img.reshape(-1).astype(jnp.float32)

    def tap(iy, ix):
        iy = jnp.clip(iy, 0, h - 1)
        ix = jnp.clip(ix, 0, w - 1)
        return jnp.take(flat, iy * w + ix)

    if order == 0:
        return tap(jnp.round(sy).astype(jnp.int32), jnp.round(sx).astype(jnp.int32))

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0).astype(jnp.float32)
    fx = (sx - x0).astype(jnp.float32)
    iy = y0.astype(jnp.int32)
    ix = x0.astype(jnp.int32)

    if order == 1:
        v00 = tap(iy, ix)
        v01 = tap(iy, ix + 1)
        v10 = tap(iy + 1, ix)
        v11 = tap(iy + 1, ix + 1)
        top = v00 * (1.0 - fx) + v01 * fx
        bot = v10 * (1.0 - fx) + v11 * fx
        return top * (1.0 - fy) + bot * fy

    if order == 3:
        wy = _cubic_weights(fy)
        wx = _cubic_weights(fx)
        acc = jnp.zeros(sy.shape, jnp.float32)
        for dy in range(-1, 3):
            row = jnp.zeros(sy.shape, jnp.float32)
            for dx in range(-1, 3):
                row = row + wx[dx + 1] * tap(iy + dy, ix + dx)
            acc = acc + wy[dy + 1] * row
        return acc

    raise ValueError(f"unsupported interpolation order {order}")


@functools.partial(jax.jit, static_argnames=("order",))
def rotate_image(img: jax.Array, angle_deg: jax.Array, order: int = 3) -> jax.Array:
    """Rotate (H, W[, C]) about (w//2, h//2) by angle (degrees, CCW-positive)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    cx = float(w // 2)
    cy = float(h // 2)
    a = jnp.cos(jnp.deg2rad(angle_deg))
    b = jnp.sin(jnp.deg2rad(angle_deg))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    dx = xs - cx
    dy = ys - cy
    # Inverse map of cv2's M = [[a, b, ...], [-b, a, ...]] (dst -> src).
    sx = a * dx - b * dy + cx
    sy = b * dx + a * dy + cy
    out = jnp.stack(
        [_sample(img[..., ch], sy, sx, order) for ch in range(c)], axis=-1
    )
    if squeeze:
        out = out[..., 0]
    return out


def rotate_mask_host(mask: np.ndarray, angle_deg: float,
                     threshold: float = 1e-3) -> np.ndarray:
    """Bicubic-rotate a binary (0/255-style) mask and threshold
    (|v| > threshold) -> uint8 {0,1}. This is the reference's
    rotate-then-binarize idiom (upstream main.py:1494-1497). Uses the f32
    native kernel: on 0/255 inputs f32 keeps ~1e-6 relative accuracy, so
    the thresholded mask matches the f64 path (asserted in
    tests/test_native.py) at ~2x the speed."""
    from sbb_textline_detection_tpu import native_bridge

    if angle_deg == 0.0:
        # bicubic at zero fractional offset is an exact identity
        # (weights are [0, 1, 0, 0]); skip the warp entirely
        return (np.asarray(mask) != 0).astype(np.uint8)
    if native_bridge.available():
        rot = native_bridge.rotate_f32(mask, angle_deg)
        return (np.abs(rot) > threshold).astype(np.uint8)
    rot = rotate_image_host(mask.astype(np.float64), angle_deg, order=3)
    return (np.abs(rot) > threshold).astype(np.uint8)


def rotate_image_host(img: np.ndarray, angle_deg: float, order: int = 3) -> np.ndarray:
    """Numpy twin of `rotate_image` for variable-shape host-side work
    (per-region crops have data-dependent shapes; jitting those would
    recompile per shape). Dispatches to the native library when built;
    the numpy path (16 fancy-indexed taps for cubic) is the parity oracle."""
    from sbb_textline_detection_tpu import native_bridge

    if native_bridge.available() and order in (0, 1, 3):
        return native_bridge.rotate(img, angle_deg, order)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    cx = float(w // 2)
    cy = float(h // 2)
    a = np.cos(np.deg2rad(angle_deg))
    b = np.sin(np.deg2rad(angle_deg))
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    dx = xs - cx
    dy = ys - cy
    sx = a * dx - b * dy + cx
    sy = b * dx + a * dy + cy

    imgf = img.astype(np.float64)

    def tap(iy, ix):
        iy = np.clip(iy, 0, h - 1)
        ix = np.clip(ix, 0, w - 1)
        return imgf[iy, ix]  # (h, w, c)

    if order == 0:
        out = tap(np.round(sy).astype(np.int64), np.round(sx).astype(np.int64))
    else:
        y0 = np.floor(sy)
        x0 = np.floor(sx)
        fy = sy - y0
        fx = sx - x0
        iy = y0.astype(np.int64)
        ix = x0.astype(np.int64)
        if order == 1:
            v00 = tap(iy, ix)
            v01 = tap(iy, ix + 1)
            v10 = tap(iy + 1, ix)
            v11 = tap(iy + 1, ix + 1)
            top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
            bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
            out = top * (1 - fy)[..., None] + bot * fy[..., None]
        elif order == 3:
            wy = _cubic_weights(fy)
            wx = _cubic_weights(fx)
            out = np.zeros((h, w, c))
            for dyk in range(-1, 3):
                row = np.zeros((h, w, c))
                for dxk in range(-1, 3):
                    row += wx[dxk + 1][..., None] * tap(iy + dyk, ix + dxk)
                out += wy[dyk + 1][..., None] * row
        else:
            raise ValueError(f"unsupported interpolation order {order}")
    if squeeze:
        out = out[..., 0]
    return out


def rotation_matrix_host(angle_deg: float, w: int, h: int) -> np.ndarray:
    """cv2.getRotationMatrix2D((w//2, h//2), angle, 1.0) equivalent (2x3)."""
    cx = float(w // 2)
    cy = float(h // 2)
    a = np.cos(np.deg2rad(angle_deg))
    b = np.sin(np.deg2rad(angle_deg))
    return np.array(
        [[a, b, (1.0 - a) * cx - b * cy], [-b, a, b * cx + (1.0 - a) * cy]],
        dtype=np.float64,
    )

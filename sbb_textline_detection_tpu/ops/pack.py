"""Bit-packing for device->host label-map transfers.

The serving environment's device->host path is orders of magnitude slower
than host->device (tunneled PCIe/RPC), and the pipeline's d2h traffic is
almost entirely uint8 label maps with <= 4 classes. Packing 4 pixels/byte
on device (one multiply-accumulate reshape, fused by XLA) cuts the
transfer 4x; unpacking on host is a vectorized shift-and-mask.

Layout: row-major pixels grouped in 4s along the flattened axis;
byte = p0 | p1<<2 | p2<<4 | p3<<6. The flat length is padded to a multiple
of 4 with zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack2_device(labels: jax.Array) -> jax.Array:
    """(...,) uint8 labels in [0, 3] -> flat (ceil(n/4),) uint8 packed."""
    flat = labels.reshape(-1).astype(jnp.uint8)
    n = flat.shape[0]
    pad = (-n) % 4
    if pad:
        flat = jnp.pad(flat, (0, pad))
    quads = flat.reshape(-1, 4)
    weights = jnp.asarray([1, 4, 16, 64], jnp.uint8)
    return (quads * weights).sum(axis=1, dtype=jnp.uint8)


def unpack2_host(packed: np.ndarray, shape) -> np.ndarray:
    """Inverse of pack2_device: packed bytes -> uint8 array of `shape`."""
    packed = np.asarray(packed, dtype=np.uint8)
    quads = np.empty((packed.size, 4), np.uint8)
    quads[:, 0] = packed & 3
    quads[:, 1] = (packed >> 2) & 3
    quads[:, 2] = (packed >> 4) & 3
    quads[:, 3] = (packed >> 6) & 3
    n = int(np.prod(shape))
    return quads.reshape(-1)[:n].reshape(shape)


# ---------------------------------------------------------------------------
# 1-bit variants for strictly binary data (8 pixels/byte): the fused
# segmentation programs' outputs once class-masked, and the deskew sweep's
# binary canvases on the upload side. Little-endian bit order throughout
# (bit i of a byte = pixel 8k+i), matching np.packbits(bitorder="little").
# ---------------------------------------------------------------------------

_BIT_WEIGHTS = (1, 2, 4, 8, 16, 32, 64, 128)


def pack1_device(bits: jax.Array) -> jax.Array:
    """(...,) uint8 values in {0, 1} -> flat (ceil(n/8),) uint8 packed."""
    flat = bits.reshape(-1).astype(jnp.uint8)
    n = flat.shape[0]
    pad = (-n) % 8
    if pad:
        flat = jnp.pad(flat, (0, pad))
    octets = flat.reshape(-1, 8)
    weights = jnp.asarray(_BIT_WEIGHTS, jnp.uint8)
    return (octets * weights).sum(axis=1, dtype=jnp.uint8)


def unpack1_host(packed: np.ndarray, shape) -> np.ndarray:
    """Inverse of pack1_device: packed bytes -> uint8 {0,1} of `shape`."""
    packed = np.asarray(packed, dtype=np.uint8)
    n = int(np.prod(shape))
    return np.unpackbits(packed, bitorder="little")[:n].reshape(shape)


def pack1_host(bits: np.ndarray) -> np.ndarray:
    """Host-side packer (h2d direction): {0,1} array -> flat packed bytes."""
    return np.packbits(np.asarray(bits, np.uint8).reshape(-1),
                       bitorder="little")


def unpack1_device(packed: jax.Array, shape) -> jax.Array:
    """Inverse of pack1_host, on device: packed bytes -> uint8 of `shape`."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, None] >> shifts) & jnp.uint8(1)
    n = int(np.prod(shape))
    return bits.reshape(-1)[:n].reshape(shape)

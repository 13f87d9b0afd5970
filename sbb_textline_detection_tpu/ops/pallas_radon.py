"""Pallas TPU kernel for the deskew Radon sweep.

The batched deskew scorer needs, per (region, angle) pair, the projection

    P[r] = antidiag_r( A @ I @ B^T ),   A, B, I: (S, S)

(see pipeline/deskew.py for the derivation). The XLA einsum path
materializes U = A @ I @ B^T per pair in HBM and reduces it with a
pad/reshape. This kernel keeps U entirely in VMEM: each grid step computes
a (TR, S) row-tile of U with two MXU matmuls and folds it into the
projection accumulator immediately.

The per-row shift of the anti-diagonal reduction (row s contributes to
bins s+u) is realized as a log-step shear: for each bit b of the row
index, rows with that bit set roll right by 2^b — log2(TR) full-tile
roll+select steps instead of TR scalar-indexed row adds. After the shear,
a plain column sum yields the tile's anti-diagonal partials.

VMEM budget per step (S=1024, TR=256, f32): A-tile 1MB + I 4MB + B 4MB +
U/shear 1.3MB + accumulator ~8KB ≈ 11MB < 16MB. The kernel is gated to
S <= 1024; larger canvases use the einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PALLAS_CANVAS = 1024
_TR = 256


def _kernel(a_ref, i_ref, b_ref, out_ref, acc_ref):
    """Grid (K, S // TR). Block shapes: a (1, TR, S), i/b (1, S, S),
    out (1, S); acc scratch (1, 2 * S)."""
    step = pl.program_id(1)
    n_steps = pl.num_programs(1)
    tr, s = a_ref.shape[1], a_ref.shape[2]

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tmp = jnp.dot(a_ref[0], i_ref[0], preferred_element_type=jnp.float32)
    u = jnp.dot(tmp, b_ref[0], preferred_element_type=jnp.float32)  # (TR, S)

    # Shear: roll row r right by r, in log2(TR) uniform-roll steps.
    w = s + tr
    v = jnp.pad(u, ((0, 0), (0, tr)))                        # (TR, W)
    row = jax.lax.broadcasted_iota(jnp.int32, (tr, w), 0)
    shift = 1
    while shift < tr:
        rolled = pltpu.roll(v, shift=shift, axis=1)
        v = jnp.where((row & shift) != 0, rolled, v)
        shift *= 2
    d = v.sum(axis=0)                                        # (W,)

    base = step * tr
    acc_ref[0, pl.ds(base, w)] += d

    @pl.when(step == n_steps - 1)
    def _():
        out_ref[0, 0, :] = acc_ref[0, pl.ds(s // 2, s)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def radon_profiles_pallas(a: jax.Array, canvases: jax.Array, b: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """(K, S, S) resampling matrices A, canvases I, shear matrices B (laid
    out as B[x, u], i.e. already transposed for U = (A I) B) -> (K, S)
    projections. All f32."""
    k, s, _ = canvases.shape
    tr = min(_TR, s)
    assert s % tr == 0, (s, tr)
    grid = (k, s // tr)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, s), lambda ki, i: (ki, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda ki, i: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda ki, i: (ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s), lambda ki, i: (ki, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 1, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 2 * s), jnp.float32)],
        interpret=interpret,
    )(a, canvases, b)[:, 0, :]


def supported(s: int) -> bool:
    return s <= MAX_PALLAS_CANVAS and s % min(_TR, s) == 0

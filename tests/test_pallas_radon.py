"""Parity: the fused Pallas Radon kernel (interpret mode on CPU) against
the XLA einsum reference path in pipeline/deskew.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sbb_textline_detection_tpu.ops import pallas_radon
from sbb_textline_detection_tpu.pipeline import deskew


def _build_inputs(k, s, seed=0):
    rng = np.random.default_rng(seed)
    canvases = (rng.uniform(size=(k, s, s)) < 0.2).astype(np.float32)
    angles = rng.uniform(-25, 25, size=(k,)).astype(np.float32)
    c = float(s // 2)
    idx = np.arange(s, dtype=np.float32)
    rad = np.deg2rad(angles)
    a = np.cos(rad)
    b = np.sin(rad)
    fy = a[:, None] * (idx - c) + c
    gx = -b[:, None] * (idx - c) + float(s // 2)
    hat = lambda x: np.maximum(0.0, 1.0 - np.abs(x))
    A = hat(idx[None, :, None] - fy[:, None, :]).astype(np.float32)
    B = hat(idx[None, :, None] - gx[:, None, :]).astype(np.float32)
    Bxu = np.ascontiguousarray(B.transpose(0, 2, 1))
    return canvases, A, B, Bxu


def _einsum_reference(A, I, B):
    s = I.shape[-1]
    U = np.einsum("ksy,kyx,kux->ksu", A, I, B).astype(np.float64)
    k = U.shape[0]
    L = 2 * s
    W = np.pad(U, ((0, 0), (0, 0), (0, L - s)))
    flat = W.reshape(k, -1)[:, : s * (L - 1)].reshape(k, s, L - 1)
    D = flat.sum(axis=1)
    return D[:, s // 2: s // 2 + s]


@pytest.mark.parametrize("s", [256, 512])
def test_pallas_kernel_matches_einsum(s):
    canvases, A, B, Bxu = _build_inputs(2, s)
    ref = _einsum_reference(A, canvases, B)
    out = np.asarray(pallas_radon.radon_profiles_pallas(
        jnp.asarray(A), jnp.asarray(canvases), jnp.asarray(Bxu),
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-2)


def test_supported_gate():
    assert pallas_radon.supported(256)
    assert pallas_radon.supported(1024)
    assert not pallas_radon.supported(1536)
    assert not pallas_radon.supported(2048)


def test_deskew_engine_pallas_path_matches_einsum_interpret(monkeypatch):
    """Force the engine's pallas branch (interpret mode) and compare the
    resulting angles to the einsum branch on the same crops."""
    import sbb_textline_detection_tpu.ops.pallas_radon as pr

    orig = pr.radon_profiles_pallas

    def interp(a, i, b, interpret=False):
        return orig(a, i, b, interpret=True)

    monkeypatch.setattr(pr, "radon_profiles_pallas", interp)
    rng = np.random.default_rng(1)
    crop = np.zeros((140, 200), np.uint8)
    for j in range(5):
        crop[12 + j * 26: 22 + j * 26, 8:192] = 1
    from sbb_textline_detection_tpu.core.config import DeskewConfig
    cfg = DeskewConfig(coarse_steps=16, vertical_steps=8)
    eng_e = deskew.DeskewEngine(cfg, max_canvas=256, use_pallas=False)
    eng_p = deskew.DeskewEngine(cfg, max_canvas=256, use_pallas=True)
    a_e = eng_e.best_angles([crop, crop.T.copy()])
    a_p = eng_p.best_angles([crop, crop.T.copy()])
    assert a_e == a_p

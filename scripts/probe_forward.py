"""Forward-pass MFU probe: time the dual-head U-Net forward with in-jit
repetition (R forwards inside ONE program, so dispatch/fetch floors
amortize) and variants that isolate the suspected drags — the f32
GroupNorms and the conv dtype. Values of the variants are NOT
production-equal (perf probe only)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from sbb_textline_detection_tpu.core import jaxenv
from sbb_textline_detection_tpu.models import registry, unet

jaxenv.enable_compilation_cache()
print("dev:", jax.devices(), flush=True)

SPEC = registry.DUALHEAD_SPEC
N_TILES = 96
R = 4


def time_variant(name, dtype, gn_dtype_f32=True):
    class GNPatch(unet.ConvGN):
        pass
    model = unet.TpuUnet(n_classes=SPEC.n_classes, widths=SPEC.widths,
                         dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, SPEC.input_height, SPEC.input_width, SPEC.in_channels),
                   jnp.float32)
    variables = model.init(rng, x1)
    tiles = jnp.asarray(np.random.default_rng(0).uniform(
        size=(N_TILES, SPEC.input_height, SPEC.input_width, SPEC.in_channels)
    ).astype(np.float32))

    @jax.jit
    def run(v, t):
        def body(i, acc):
            logits = model.apply(v, t + i * 1e-6)
            return acc + jnp.sum(logits[..., 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    t0 = time.time()
    float(run(variables, tiles))
    print(f"{name}: first {time.time()-t0:.1f}s", flush=True)
    walls = []
    for _ in range(5):
        t0 = time.time()
        float(run(variables, tiles))
        walls.append(time.time() - t0)
    per = min(walls) / R
    flops = 2 * 0.0  # reported separately by cost analysis
    comp = jax.jit(lambda v, t: model.apply(v, t)).lower(
        variables, tiles).compile()
    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    print(f"{name}: {per*1e3:7.1f} ms/forward ({N_TILES} tiles)  "
          f"flops {flops:.3g}  -> {flops/per/1e12 if per else 0:.1f} TF/s",
          flush=True)


time_variant("bf16+f32GN (production)", jnp.bfloat16)
time_variant("f32 everything", jnp.float32)

# GN in bf16: monkeypatch ConvGN's GroupNorm dtype
import flax.linen as nn

_orig = unet.ConvGN.__call__


def _bf16_gn_call(self, x):
    x = nn.Conv(self.features, self.kernel, strides=self.strides,
                padding="SAME", use_bias=False, dtype=self.dtype)(x)
    x = nn.GroupNorm(num_groups=min(32, self.features),
                     dtype=jnp.bfloat16)(x)
    return nn.gelu(x).astype(self.dtype)


unet.ConvGN.__call__ = nn.compact(_bf16_gn_call)
time_variant("bf16 + bf16GN", jnp.bfloat16)
unet.ConvGN.__call__ = _orig

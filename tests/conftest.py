"""Test configuration: force a virtual 8-device CPU mesh so every test —
including sharding tests — runs without TPU hardware.

The environment's TPU plugin (axon) registers itself at interpreter start
and sets jax_platforms="axon,cpu" through jax.config — overriding the
JAX_PLATFORMS env var. Tests must therefore update jax.config directly
(before any backend is initialized) to pin the CPU backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: big-model CPU compiles on this 1-core VM are
# minutes; cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The env-var route above is not honored by this environment's jax build;
# enable the persistent compile cache through the config API as well.
from sbb_textline_detection_tpu.core import jaxenv  # noqa: E402

jaxenv.enable_compilation_cache()

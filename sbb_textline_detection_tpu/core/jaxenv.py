"""JAX environment knobs.

The persistent compilation cache must be enabled through `jax.config`
(the JAX_COMPILATION_CACHE_DIR env var is not honored under this
environment's TPU plugin, which finalizes config at import). Page-shaped
tiled programs take 10-30s each to compile; the cache makes every shape a
one-time cost per machine instead of per process.
"""

from __future__ import annotations

import os

# Repo-local by default: /tmp is wiped between container sessions, and a
# cold cache costs ~200 s of page-shape compiles on the first run. The
# directory is .gitignored.
_REPO_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".cache", "jax")
_DEFAULT_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", _REPO_CACHE)
_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Idempotently enable the persistent XLA compilation cache."""
    global _enabled
    if _enabled:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # older jax: flag absent
    _enabled = True

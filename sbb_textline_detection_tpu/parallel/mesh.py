"""Device mesh + sharding helpers.

The reference's only parallelism is a host multiprocessing fan-out for
deskew (upstream main.py:1721-1799) and strictly batch-size-1 inference.
TPU-native equivalents here:

  * `make_mesh` — a (data, model) mesh over ICI; data parallelism shards
    pages/patch-batches, model parallelism shards conv output channels
    (tensor parallelism) for training at scale;
  * `batch_sharding` / `param_shardings` — NamedSharding trees that jit
    consumes; XLA inserts the all-gathers/reduce-scatters over ICI.

Single-chip inference needs none of this (the CNNs fit in one v5e HBM);
multi-chip matters for batch serving (data-parallel pages) and training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_names=("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Mesh over the given (default: all) devices with a trailing model axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model_parallel = max(1, model_parallel)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; NHWC replicated
    otherwise."""
    return NamedSharding(mesh, P("data", None, None, None))


def label_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Leading (batch) dim over data; rest replicated. ndim=4 for the
    dual-head joint task's stacked (N, H, W, heads) label planes."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params) -> "object":
    """Tensor-parallel sharding tree: conv kernels (H, W, I, O) shard O over
    the model axis when divisible; everything else replicated."""
    model_size = mesh.shape["model"]

    def spec(path, leaf):
        shape = np.shape(leaf)
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if name == "kernel" and len(shape) == 4 and shape[-1] % model_size == 0:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if name in ("bias", "scale") and len(shape) == 1 and \
                shape[0] % model_size == 0:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_tree(tree, shardings):
    """device_put a pytree with a matching sharding tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings)

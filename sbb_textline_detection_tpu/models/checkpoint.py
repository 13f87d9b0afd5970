"""Checkpoint I/O.

The reference loads Keras `.h5` files from disk once per page per stage
(upstream main.py:216-223, called from 386/442/492 — a TF1-session-leak
workaround). Here checkpoints are loaded once per process into an immutable
param pytree.

On-disk format: a single `.npz` holding the flattened variable tree plus a
JSON metadata entry carrying the ModelSpec (geometry + class count, the
same information the reference reads from the model's last layer at
main.py:227-229).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
import jax

from sbb_textline_detection_tpu.models.registry import ModelSpec

_META_KEY = "__meta__"
_SEP = "::"


def save(path: str, spec: ModelSpec, variables) -> None:
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {}
    for keypath, leaf in flat:
        key = _SEP.join(_key_str(k) for k in keypath)
        arrays[key] = np.asarray(leaf)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(spec.to_meta()).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load(path: str) -> Tuple[ModelSpec, dict]:
    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY]).decode("utf-8"))
        spec = ModelSpec.from_meta(meta)
        tree: dict = {}
        for key in data.files:
            if key == _META_KEY:
                continue
            node = tree
            parts = key.split(_SEP)
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return spec, tree


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def checkpoint_path(model_dir: str, name: str) -> str:
    """Resolve `<model_dir>/<name>.npz`, tolerating a legacy `.h5` suffix in
    the configured name."""
    base = name[:-3] if name.endswith(".h5") else name
    return os.path.join(model_dir, base + ".npz")

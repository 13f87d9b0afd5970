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


def npz_path(model_dir: str, name: str) -> str:
    """Plain `<model_dir>/<name>.npz` (no conversion logic), tolerating a
    legacy `.h5` suffix in the configured name."""
    base = name[:-3] if name.endswith(".h5") else name
    return os.path.join(model_dir, base + ".npz")


def checkpoint_path(model_dir: str, name: str) -> str:
    """Resolve `<model_dir>/<name>.npz`, tolerating a legacy `.h5` suffix in
    the configured name.

    Drop-in `.h5` support: the reference CLI points `-m` at a directory of
    Keras `.h5` checkpoints directly (upstream main.py:58-60, loaded at
    main.py:216-223). When `<name>.h5` exists and the converted `.npz`
    sibling is missing or older than the `.h5`, it is converted on load
    (models/convert.py) and cached as the sibling; a partial weight map
    raises loudly with the ImportReport summary rather than silently
    degrading every page. If `model_dir` is read-only the cache falls back
    to `~/.cache/sbb_textline_detection_tpu/`."""
    import logging

    base = name[:-3] if name.endswith(".h5") else name
    npz = os.path.join(model_dir, base + ".npz")
    h5 = os.path.join(model_dir, base + ".h5")
    if not os.path.exists(h5):
        return npz
    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "sbb_textline_detection_tpu",
        _dir_cache_key(model_dir))
    cached = os.path.join(cache_dir, base + ".npz")
    for candidate in (npz, cached):
        if os.path.exists(candidate) and \
                os.path.getmtime(candidate) >= os.path.getmtime(h5):
            return candidate
    log = logging.getLogger("sbb_textline_detection_tpu.checkpoint")
    from sbb_textline_detection_tpu.models.convert import convert_h5

    reports: list = []
    for out_dir, out_path in ((model_dir, npz), (cache_dir, cached)):
        try:
            path = convert_h5(h5, out_dir, name=base, report_out=reports)
        except (OSError, PermissionError) as exc:
            log.warning("cannot write converted checkpoint next to %s "
                        "(%s); trying the user cache", h5, exc)
            continue
        spec, report = reports[-1]
        log.info("converted %s -> %s [%s %dx%d n_classes=%d; %d layers "
                 "mapped]", h5, path, spec.arch, spec.input_height,
                 spec.input_width, spec.n_classes, len(report.mapped))
        return path
    raise OSError(f"could not write a converted checkpoint for {h5} "
                  f"(model dir and user cache both unwritable)")


def _dir_cache_key(model_dir: str) -> str:
    import hashlib

    return hashlib.sha256(
        os.path.abspath(model_dir).encode("utf-8")).hexdigest()[:16]

"""Best-effort Keras `.h5` → param-pytree importer.

The upstream tool consumes three Keras 2.3 checkpoints
(model_page_mixed_best.h5 / model_strukturerkennung.h5 /
model_textline_new.h5, upstream main.py:58-60), whose architecture is the
ResNet50-encoder U-Net of the sibling sbb_pixelwise_segmentation repo. This
importer reads the Keras HDF5 weight layout (group `model_weights`, per-layer
`weight_names` attrs) without TensorFlow and maps weights into our
`ResNet50Unet` module tree:

  * encoder layers are mapped by their canonical Keras ResNet50 names
    (conv1, bn_conv1, res{stage}{block}_branch{2a,2b,2c,1}, bn...);
  * decoder layers (auto-named conv2d_N / batch_normalization_N in Keras)
    are mapped positionally in creation order;
  * Keras conv kernels are already HWIO — no transpose needed; BatchNorm
    (gamma, beta, moving_mean, moving_variance) maps to flax
    (scale, bias, mean, var).

Returns the variables plus an import report listing any unmapped source
layers or unfilled target leaves, so partial imports are loud, not silent.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class ImportReport:
    mapped: List[str]
    unmapped_source: List[str]
    unfilled_target: List[str]

    @property
    def complete(self) -> bool:
        return not self.unmapped_source and not self.unfilled_target


def _read_keras_h5(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    import h5py

    out: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in g.attrs.get("layer_names", list(g.keys()))]
        for lname in layer_names:
            if lname not in g:
                continue
            lg = g[lname]
            weight_names = [n.decode() if isinstance(n, bytes) else n
                            for n in lg.attrs.get("weight_names", [])]
            if not weight_names:
                continue
            weights = {}
            for wn in weight_names:
                short = wn.split("/")[-1].split(":")[0]
                weights[short] = np.asarray(lg[wn])
            out[lname] = weights
    return out


_RES_RE = re.compile(r"^(bn|res)(\d)([a-z])_branch(2a|2b|2c|1)$")
_BRANCH_TO_FLAX = {"2a": ("conv_a", "bn_a"), "2b": ("conv_b", "bn_b"),
                   "2c": ("conv_c", "bn_c"), "1": ("shortcut_conv", "shortcut_bn")}
_DECODER_CONVS = ["dec_conv5", "dec_conv4", "dec_conv3", "dec_conv2",
                  "dec_conv1", "head"]
_DECODER_BNS = ["dec_bn5", "dec_bn4", "dec_bn3", "dec_bn2", "dec_bn1"]


def _target_path(lname: str, conv_counter: List[int], bn_counter: List[int]):
    """Map a Keras layer name to (kind, flax module path tuple)."""
    if lname == "conv1":
        return "conv", ("conv1",)
    if lname == "bn_conv1":
        return "bn", ("bn_conv1", "BatchNorm_0")
    m = _RES_RE.match(lname)
    if m:
        kind, stage, block, branch = m.groups()
        conv_name, bn_name = _BRANCH_TO_FLAX[branch]
        base = f"res{stage}{block}"
        if kind == "res":
            return "conv", (base, conv_name)
        return "bn", (base, bn_name, "BatchNorm_0")
    if lname.startswith("conv2d"):
        idx = conv_counter[0]
        conv_counter[0] += 1
        if idx < len(_DECODER_CONVS):
            return "conv", (_DECODER_CONVS[idx],)
    if lname.startswith("batch_normalization"):
        idx = bn_counter[0]
        bn_counter[0] += 1
        if idx < len(_DECODER_BNS):
            return "bn", (_DECODER_BNS[idx], "BatchNorm_0")
    return None, None


def _set(tree: dict, path: Tuple[str, ...], leaf: str, value: np.ndarray,
         filled: set) -> bool:
    node = tree
    for p in path:
        if p not in node:
            return False
        node = node[p]
    if leaf not in node:
        return False
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        return False
    node[leaf] = value
    filled.add(path + (leaf,))
    return True


def import_h5(path: str, variables) -> Tuple[dict, ImportReport]:
    """Fill a ResNet50Unet variable tree with weights from a Keras .h5."""
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    layers = _read_keras_h5(path)

    mapped: List[str] = []
    unmapped: List[str] = []
    filled: set = set()
    conv_counter = [0]
    bn_counter = [0]

    for lname, weights in layers.items():
        kind, tpath = _target_path(lname, conv_counter, bn_counter)
        ok = False
        if kind == "conv":
            ok = _set(params, tpath, "kernel", weights.get("kernel"), filled)
            if "bias" in weights:
                ok = _set(params, tpath, "bias", weights["bias"], filled) and ok
        elif kind == "bn":
            ok = _set(params, tpath, "scale", weights.get("gamma"), filled)
            ok = _set(params, tpath, "bias", weights.get("beta"), filled) and ok
            ok = _set(stats, tpath, "mean", weights.get("moving_mean"), filled) and ok
            ok = _set(stats, tpath, "var", weights.get("moving_variance"), filled) and ok
        (mapped if ok else unmapped).append(lname)

    unfilled: List[str] = []
    for collection, tree in (("params", params), ("batch_stats", stats)):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, _ in flat:
            p = tuple(getattr(k, "key", str(k)) for k in keypath)
            if p not in filled:
                unfilled.append(collection + "/" + "/".join(p))

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, ImportReport(mapped, unmapped, unfilled)

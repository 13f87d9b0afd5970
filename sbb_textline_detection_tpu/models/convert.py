"""Offline Keras `.h5` -> `.npz` checkpoint converter (CLI).

One-shot converter for the reference's three published checkpoints
(upstream main.py:58-60; downloaded from qurator-data.de per upstream
README.md:41-42): reads the Keras HDF5 weight layout without TensorFlow
(models/h5_import.py), fills our ResNet50Unet module tree, and saves the
framework's .npz checkpoint with embedded ModelSpec metadata — after which
models load once per process instead of once per page per stage.

Model geometry: the reference reads input size / class count from the
loaded model's last layer (main.py:227-229); here the class count is read
from the .h5 head conv kernel and the input size from the model_config
JSON when present (flag override otherwise).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Optional, Tuple

import click
import numpy as np


def infer_geometry(h5_path: str) -> Tuple[Optional[int], Optional[int], int]:
    """(input_h, input_w, n_classes) from a Keras .h5; sizes None if the
    model_config attribute is absent."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        h = w = None
        cfg = f.attrs.get("model_config")
        if cfg is not None:
            if isinstance(cfg, bytes):
                cfg = cfg.decode("utf-8")
            try:
                layers = json.loads(cfg)["config"]["layers"]
                for layer in layers:
                    shape = layer.get("config", {}).get("batch_input_shape")
                    if shape and len(shape) == 4:
                        h, w = int(shape[1]), int(shape[2])
                        break
            except Exception:
                pass
        g = f["model_weights"] if "model_weights" in f else f
        # head = last conv kernel in layer order; its out-channels = classes
        n_classes = None
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in g.attrs.get("layer_names", list(g.keys()))]
        for lname in layer_names:
            if lname not in g:
                continue
            lg = g[lname]
            for wn in lg.attrs.get("weight_names", []):
                wn = wn.decode() if isinstance(wn, bytes) else wn
                if wn.endswith("kernel:0"):
                    arr = lg[wn]
                    if arr.ndim == 4:
                        n_classes = int(arr.shape[-1])
        if n_classes is None:
            raise ValueError(f"{h5_path}: no conv kernels found")
        return h, w, n_classes


def convert_h5(h5_path: str, out_dir: str, name: Optional[str] = None,
               input_h: Optional[int] = None,
               input_w: Optional[int] = None,
               report_out=None) -> str:
    """Convert one .h5 into <out_dir>/<name>.npz; returns the output path.
    Raises if the weight mapping is incomplete (loud, not silent);
    `report_out`, if given, receives (spec, ImportReport) either way so
    callers (the CLI) can surface the mapping summary."""
    from sbb_textline_detection_tpu.models import checkpoint, h5_import, registry

    gh, gw, n_classes = infer_geometry(h5_path)
    input_h = input_h or gh or 448
    input_w = input_w or gw or 448
    base = name or os.path.splitext(os.path.basename(h5_path))[0]
    spec = registry.ModelSpec(base, "resnet50_unet", input_h, input_w,
                              n_classes)
    variables = registry.init_variables(spec, seed=0)
    import jax
    variables = jax.tree_util.tree_map(np.asarray, variables)
    filled, report = h5_import.import_h5(h5_path, variables)
    if report_out is not None:
        report_out.append((spec, report))
    if not report.complete:
        raise ValueError(
            f"{h5_path}: incomplete import — "
            f"{len(report.mapped)} layers mapped, unmapped source layers "
            f"{report.unmapped_source}, unfilled target leaves "
            f"{report.unfilled_target}")
    os.makedirs(out_dir, exist_ok=True)
    out_path = checkpoint.npz_path(out_dir, base)
    checkpoint.save(out_path, spec, filled)
    return out_path


@click.command()
@click.option("--input", "-i", "input_path", required=True,
              type=click.Path(exists=True),
              help=".h5 file or directory containing the three reference "
                   "checkpoints")
@click.option("--out", "-o", required=True, type=click.Path(file_okay=False),
              help="output directory for .npz checkpoints")
@click.option("--height", type=int, default=None,
              help="override model input height")
@click.option("--width", type=int, default=None,
              help="override model input width")
def main(input_path, out, height, width):
    """Convert Keras .h5 checkpoint(s) to framework .npz checkpoints."""
    if os.path.isdir(input_path):
        paths = sorted(
            os.path.join(input_path, f) for f in os.listdir(input_path)
            if f.endswith(".h5"))
        if not paths:
            click.echo("no .h5 files found", err=True)
            sys.exit(2)
    else:
        paths = [input_path]
    failures = 0
    for p in paths:
        reports = []
        try:
            out_path = convert_h5(p, out, input_h=height, input_w=width,
                                  report_out=reports)
        except Exception as exc:
            failures += 1
            click.echo(f"{p}: FAILED — {exc}", err=True)
            if reports:
                _, rep = reports[0]
                click.echo(
                    f"  mapped {len(rep.mapped)} layers; "
                    f"unmapped source: {rep.unmapped_source or 'none'}; "
                    f"unfilled target: {rep.unfilled_target or 'none'}",
                    err=True)
            continue
        spec, rep = reports[0]
        click.echo(
            f"{p} -> {out_path}  [{spec.arch} {spec.input_height}x"
            f"{spec.input_width} n_classes={spec.n_classes}; "
            f"{len(rep.mapped)} layers mapped, import complete]")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()

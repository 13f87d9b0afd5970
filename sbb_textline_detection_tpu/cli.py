"""Command-line interface.

`sbb_textline_detector_tpu -i IMAGE -o OUT_DIR -m MODEL_DIR` mirrors the
reference CLI (upstream main.py:2162-2171). Extensions over the reference:
  * `-i` may be a directory — all pages are processed as one batch with the
    models loaded once (the reference is strictly one image per process);
  * `--synthetic-models` runs with randomly initialized models (smoke tests
    and benchmarking without checkpoint downloads).
"""

from __future__ import annotations

import os
import sys
import time

import click

# Persistent XLA compilation cache: page-shaped tiled programs compile in
# 10-30s each; cache them across processes before jax initializes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG


@click.command()
@click.option("--image", "-i", required=True,
              type=click.Path(exists=True),
              help="image filename or directory of images")
@click.option("--out", "-o", required=True,
              type=click.Path(exists=True, file_okay=False),
              help="directory to write output xml data")
@click.option("--model", "-m", required=False,
              type=click.Path(exists=True, file_okay=False),
              help="directory of models (converted .npz checkpoints)")
@click.option("--synthetic-models", is_flag=True, default=False,
              help="use randomly initialized models (smoke/benchmark runs)")
def main(image, out, model, synthetic_models):
    from sbb_textline_detection_tpu.models.runner import ModelBundle
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

    if synthetic_models:
        models = ModelBundle.random_init(DEFAULT_CONFIG.runtime)
    elif model:
        models = ModelBundle.from_dir(model, DEFAULT_CONFIG.runtime,
                                      DEFAULT_CONFIG.model_names)
    else:
        click.echo("either --model or --synthetic-models is required", err=True)
        sys.exit(2)

    detector = TextlineDetector(models, DEFAULT_CONFIG)

    if os.path.isdir(image):
        exts = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")
        paths = sorted(
            os.path.join(image, f) for f in os.listdir(image)
            if f.lower().endswith(exts))
    else:
        paths = [image]

    if len(paths) > 1:
        # Pipelined batch: device phase of page N+1 overlaps host phase of N.
        t0 = time.time()
        for path, xml_path in zip(paths, detector.run_files(paths, out)):
            click.echo(f"{path} -> {xml_path}  "
                       f"({time.time() - t0:.2f}s elapsed)")
    else:
        for path in paths:
            t0 = time.time()
            xml_path = detector.run_file(path, out)
            click.echo(f"{path} -> {xml_path}  "
                       f"({time.time() - t0:.2f}s)")


if __name__ == "__main__":
    main()

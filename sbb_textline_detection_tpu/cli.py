"""Command-line interface.

`sbb_textline_detector_tpu -i IMAGE -o OUT_DIR -m MODEL_DIR` mirrors the
reference CLI (upstream main.py:2162-2171). Extensions over the reference:
  * `-i` may be a directory — all pages are processed as one batch with the
    models loaded once (the reference is strictly one image per process);
  * `--synthetic-models` runs with randomly initialized models (smoke tests
    and benchmarking without checkpoint downloads);
  * `--profile DIR` wraps the run in a jax.profiler trace (TensorBoard/
    Perfetto) — the reference's only instrumentation is stage-time prints
    (main.py:2144-2151), which we keep as structured per-page timings.
"""

from __future__ import annotations

import os
import sys
import time

import click

# The persistent XLA compilation cache is enabled by
# core.jaxenv.enable_compilation_cache (TextlineDetector calls it); its
# default directory is repo-local (.cache/jax) because /tmp is wiped
# between container sessions — do NOT setdefault a /tmp path here, it
# would override that default and re-incur ~200 s of cold page-shape
# compiles per session.

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
@click.option("--profile", type=click.Path(file_okay=False), default=None,
              help="write a jax.profiler trace to this directory")
@click.option("--timings", is_flag=True, default=False,
              help="print the per-stage timing breakdown per page")
def main(image, out, model, synthetic_models, profile, timings):
    from sbb_textline_detection_tpu.models.runner import ModelBundle
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector
    from sbb_textline_detection_tpu.utils import profiling

    if synthetic_models:
        # dual_head: the flagship serving config (one shared-trunk forward
        # for the region+textline roles) — the smoke path exercises what
        # production runs
        models = ModelBundle.random_init(DEFAULT_CONFIG.runtime,
                                         dual_head=True)
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

    with profiling.trace(profile):
        if len(paths) > 1:
            # Pipelined batch: device phase of page N+1 overlaps host
            # phase of N. Pre-load every device program in parallel first
            # (sized to the first page) — program loads through the
            # serving transport stall independently, so overlapping them
            # collapses the cold start to the slowest single load.
            from sbb_textline_detection_tpu.pipeline.detector import load_image
            first = load_image(paths[0])
            t0 = time.time()
            detector.warm_up(first.shape[0], first.shape[1])
            click.echo(f"[warm-up {time.time() - t0:.1f}s]", err=True)
            def pages():
                yield first, paths[0]
                for p in paths[1:]:
                    yield load_image(p), p

            t0 = time.time()
            results = detector.process_batch(pages())
            for path, res in zip(paths, results):
                f_name = os.path.splitext(os.path.basename(path))[0]
                xml_path = res.write(out, f_name)
                click.echo(f"{path} -> {xml_path}  "
                           f"({time.time() - t0:.2f}s elapsed)")
                if timings:
                    click.echo("  " + " ".join(
                        f"{k}={v:.2f}s" for k, v in res.timings.items()))
        else:
            for path in paths:
                t0 = time.time()
                from sbb_textline_detection_tpu.pipeline.detector import (
                    load_image)
                res = detector.process_image(load_image(path), path)
                f_name = os.path.splitext(os.path.basename(path))[0]
                xml_path = res.write(out, f_name)
                click.echo(f"{path} -> {xml_path}  "
                           f"({time.time() - t0:.2f}s)")
                if timings:
                    click.echo("  " + " ".join(
                        f"{k}={v:.2f}s" for k, v in res.timings.items()))


if __name__ == "__main__":
    main()

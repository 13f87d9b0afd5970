"""Inference engine: batched whole-image and overlapped-patch prediction.

TPU-native replacement for the reference's `do_prediction`
(upstream main.py:225-380). Differences by design:

  * the reference predicts one tile per `model.predict` call in a Python
    loop (main.py:259-288, batch size 1); here all tiles form one padded
    (bucketed) batch through a single jit'd forward — the MXU sees large
    batched convs, and bucketing bounds recompiles;
  * normalization (/255, main.py:239) and argmax (main.py:290) happen on
    device inside the same jit, so only uint8 labels cross back to host;
  * stitching uses ops.tiling (exact 9-case parity, see that module);
  * whole-image mode resizes input to model geometry and the argmax label
    map back to page size with INTER_NEAREST semantics (main.py:368-379).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sbb_textline_detection_tpu.core.config import RuntimeConfig
from sbb_textline_detection_tpu.models import registry
from sbb_textline_detection_tpu.models.registry import ModelSpec
from sbb_textline_detection_tpu.ops import resize as resize_ops
from sbb_textline_detection_tpu.ops import tiling


class SegmentationModel:
    """One loaded segmentation model with a cached, bucketed jit forward."""

    def __init__(self, spec: ModelSpec, variables,
                 runtime: RuntimeConfig | None = None):
        self.spec = spec
        self.variables = variables
        self.runtime = runtime or RuntimeConfig()
        self._module = registry.build_module(spec)

        @functools.partial(jax.jit, static_argnums=())
        def _forward_labels(variables, batch_u8):
            x = batch_u8.astype(jnp.float32) / 255.0
            logits = self._module.apply(variables, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        self._forward_labels = _forward_labels

    # -- geometry ----------------------------------------------------------
    @property
    def input_hw(self) -> Tuple[int, int]:
        return self.spec.input_height, self.spec.input_width

    @property
    def n_classes(self) -> int:
        return self.spec.n_classes

    # -- prediction --------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.runtime.batch_buckets:
            if n <= b:
                return b
        b = self.runtime.batch_buckets[-1]
        return ((n + b - 1) // b) * b

    def predict_labels(self, batch_u8: np.ndarray) -> np.ndarray:
        """(N, h, w, 3) uint8 -> (N, h, w) uint8 labels, chunked by bucket."""
        n = batch_u8.shape[0]
        cap = self.runtime.batch_buckets[-1]
        outs = []
        for start in range(0, n, cap):
            chunk = batch_u8[start:start + cap]
            bucket = self._bucket(chunk.shape[0])
            if chunk.shape[0] < bucket:
                pad = np.zeros((bucket - chunk.shape[0],) + chunk.shape[1:],
                               dtype=chunk.dtype)
                padded = np.concatenate([chunk, pad], axis=0)
            else:
                padded = chunk
            labels = np.asarray(self._forward_labels(self.variables, padded))
            outs.append(labels[:chunk.shape[0]])
        return np.concatenate(outs, axis=0)

    def predict_whole(self, img_u8: np.ndarray) -> np.ndarray:
        """Whole-image mode (main.py:368-379): resize to model size, predict,
        argmax, nearest-resize the label map back to the input size."""
        h, w = img_u8.shape[:2]
        mh, mw = self.input_hw
        small = resize_ops.resize_nearest_host(img_u8, mh, mw)
        labels = self.predict_labels(small[None])[0]
        return resize_ops.resize_nearest_host(labels, h, w)

    def predict_tiled(self, img_u8: np.ndarray,
                      margin_ratio: float = 0.1) -> np.ndarray:
        """Patch mode (main.py:231-364): overlapped grid, batched forward,
        seam-trimmed stitch. Images smaller than the model geometry are
        zero-padded and cropped back (the reference would raise instead and
        rely on the caller's catch-all; we degrade gracefully)."""
        h, w = img_u8.shape[:2]
        mh, mw = self.input_hw
        pad_h = max(0, mh - h)
        pad_w = max(0, mw - w)
        img = img_u8
        if pad_h or pad_w:
            img = np.pad(img_u8, ((0, pad_h), (0, pad_w), (0, 0)))
        grid = tiling.compute_grid(img.shape[0], img.shape[1], mh, mw,
                                   margin_ratio)
        tiles = tiling.extract_tiles(img, grid)
        labels = self.predict_labels(tiles)
        stitched = tiling.stitch_labels(labels, grid)
        return stitched[:h, :w]


class ModelBundle:
    """The three pipeline models, loaded once per process (the reference
    reloads each .h5 from disk per page, main.py:216-223/386/442/492)."""

    def __init__(self, page: SegmentationModel, region: SegmentationModel,
                 textline: SegmentationModel):
        self.page = page
        self.region = region
        self.textline = textline

    @staticmethod
    def from_dir(model_dir: str, runtime: RuntimeConfig | None = None,
                 model_names=None) -> "ModelBundle":
        from sbb_textline_detection_tpu.core.config import ModelNames
        from sbb_textline_detection_tpu.models import checkpoint

        names = model_names or ModelNames()
        models = {}
        for role in ("page", "region", "textline"):
            path = checkpoint.checkpoint_path(model_dir, getattr(names, role))
            spec, variables = checkpoint.load(path)
            models[role] = SegmentationModel(spec, variables, runtime)
        return ModelBundle(**models)

    @staticmethod
    def random_init(runtime: RuntimeConfig | None = None, seed: int = 0,
                    specs=None) -> "ModelBundle":
        """Randomly initialized bundle (tests / benchmarks / smoke runs)."""
        specs = specs or registry.DEFAULT_SPECS
        models = {
            role: SegmentationModel(spec, registry.init_variables(spec, seed),
                                    runtime)
            for role, spec in specs.items()
        }
        return ModelBundle(**models)

"""Model registry: named specs for the three pipeline roles.

The reference hard-codes three checkpoint filenames (upstream main.py:58-60)
and reads each model's input geometry and class count from the loaded
model's last layer (main.py:227-229). Here the same metadata travels inside
our checkpoint files; this registry holds the defaults used when
initializing fresh (random/trained-from-scratch) models.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from sbb_textline_detection_tpu.models import unet


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    arch: str                    # 'tpu_unet' | 'resnet50_unet'
    input_height: int
    input_width: int
    n_classes: int
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    # Dual-head flagship (see runner dual-head paths): `heads` splits the
    # n_classes logits into per-task argmax groups — (3, 2) = region head
    # {background, text, other} + textline head {background, textline} on
    # one shared trunk, halving the fused segmentation forward cost.
    # `in_channels` is the model input depth: 3 for the classic RGB-tile
    # models, 2 for the dual-head input [raw01, otsu-binarized].
    heads: Tuple[int, ...] = ()
    in_channels: int = 3

    def __post_init__(self):
        if self.heads and sum(self.heads) != self.n_classes:
            raise ValueError(
                f"heads {self.heads} must sum to n_classes {self.n_classes}")

    def to_meta(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_meta(meta: dict) -> "ModelSpec":
        meta = dict(meta)
        meta["widths"] = tuple(meta.get("widths", (64, 128, 256, 512)))
        meta["heads"] = tuple(meta.get("heads", ()))
        meta.setdefault("in_channels", 3)
        return ModelSpec(**meta)


# Pipeline role defaults. Geometry mirrors the reference models' 448x448
# patch size; class counts: page = {background, printspace}, region =
# {background, text, other}, textline = {background, textline}.
#
# Flagship trunk widths are (32, 64, 128, 256) — quartered from the
# r1-r3 (64, 128, 256, 512): the conv GEMMs scale with Cin*Cout, so the
# per-tile forward drops ~4x (126 -> ~33 GFLOP at 448x448). Rationale
# (VERDICT r3 #1): at 8.67 TFLOP/page even MFU=1.0 caps at 22.7
# pages/sec on a 197 TFLOP/s chip; the >= 50 pages/sec target demands
# <= ~3 TFLOP/page. The reference's geometry contract is only "read it
# from the checkpoint" (main.py:227-229), and page-segmentation strokes
# are 20+ px at working scale — quality is gated by the hardened bench
# corpus (bench.py), which must hold recall 1.0 / precision >= 0.97.
# Imported upstream .h5 checkpoints are unaffected (resnet50_unet arch;
# widths travel inside each checkpoint's metadata).
FLAGSHIP_WIDTHS = (32, 64, 128, 256)

DEFAULT_SPECS = {
    "page": ModelSpec("model_page_mixed_best", "tpu_unet", 448, 448, 2,
                      widths=FLAGSHIP_WIDTHS),
    "region": ModelSpec("model_strukturerkennung", "tpu_unet", 448, 448, 3,
                        widths=FLAGSHIP_WIDTHS),
    "textline": ModelSpec("model_textline_new", "tpu_unet", 448, 448, 2,
                          widths=FLAGSHIP_WIDTHS),
}

# The dual-head flagship: region (3) + textline (2) heads on one trunk,
# fed [raw01, otsu-binarized]. One forward replaces the fused path's two
# (the trunk cost is channel-count independent past the stem), halving
# segmentation FLOPs per tile. Serves BOTH the region and textline roles
# of a ModelBundle; the classic two-model bundle remains the import
# target for upstream .h5 checkpoints (separate models, main.py:58-60).
DUALHEAD_SPEC = ModelSpec("model_dualhead", "tpu_unet", 448, 448, 5,
                          heads=(3, 2), in_channels=2,
                          widths=FLAGSHIP_WIDTHS)


def build_module(spec: ModelSpec):
    if spec.arch == "tpu_unet":
        return unet.TpuUnet(n_classes=spec.n_classes, widths=spec.widths)
    if spec.arch == "resnet50_unet":
        return unet.ResNet50Unet(n_classes=spec.n_classes)
    raise ValueError(f"unknown architecture {spec.arch!r}")


def init_variables(spec: ModelSpec, seed: int = 0):
    module = build_module(spec)
    dummy = jnp.zeros((1, spec.input_height, spec.input_width,
                       spec.in_channels), jnp.float32)
    # jit the init: one compile, and XLA dead-code-eliminates the forward
    # math (param init depends only on shapes) — eager init would compile
    # every conv op separately.
    return jax.jit(module.init)(jax.random.PRNGKey(seed), dummy)

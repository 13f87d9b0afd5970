"""TPU-native document layout analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
qurator-spk/sbb_textline_detection: page border (printspace) detection,
text-region segmentation, textline extraction, deskewing, reading order,
and PAGE-XML output — designed TPU-first (batched patch inference, device
morphology/deskew, SPMD page parallelism) rather than as a port.

Public API (heavy imports stay lazy — importing the package does not pull
in jax):

    from sbb_textline_detection_tpu import TextlineDetector, ModelBundle
"""

__version__ = "1.0.0"

from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG, PipelineConfig

__all__ = ["DEFAULT_CONFIG", "PipelineConfig", "TextlineDetector",
           "ModelBundle", "PageResult", "__version__"]


def __getattr__(name):
    if name in ("TextlineDetector", "PageResult"):
        from sbb_textline_detection_tpu.pipeline import detector
        return getattr(detector, name)
    if name == "ModelBundle":
        from sbb_textline_detection_tpu.models.runner import ModelBundle
        return ModelBundle
    raise AttributeError(name)

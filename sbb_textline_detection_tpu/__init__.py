"""TPU-native document layout analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
qurator-spk/sbb_textline_detection: page border (printspace) detection,
text-region segmentation, textline extraction, deskewing, reading order,
and PAGE-XML output — designed TPU-first (batched patch inference, device
morphology/deskew, SPMD page parallelism) rather than as a port.
"""

__version__ = "0.1.0"

from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG, PipelineConfig

__all__ = ["DEFAULT_CONFIG", "PipelineConfig", "__version__"]

"""OCR-D processor facade tests (the framework-free parts; the full
workspace flow needs the optional `ocrd` package)."""

import json

import pytest

from sbb_textline_detection_tpu.ocrd import processor


def test_ocrd_tool_descriptor_loads():
    tool = processor.ocrd_tool()
    t = tool["tools"]["ocrd-sbb-textline-detector-tpu"]
    assert t["executable"] == "ocrd-sbb-textline-detector-tpu"
    assert t["categories"] == ["Layout analysis"]
    assert "layout/segmentation/region" in t["steps"]
    assert "layout/segmentation/line" in t["steps"]
    assert "model" in t["parameters"]


def test_processor_requires_ocrd():
    try:
        import ocrd  # noqa: F401
        pytest.skip("ocrd installed; facade constructs for real")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="ocrd"):
        processor.OcrdSbbTextlineDetectorRecognize(
            workspace=None, input_file_grp="A", output_file_grp="B")
    with pytest.raises(ImportError, match="ocrd"):
        processor.ocrd_sbb_textline_detector_tpu()

"""Golden-output regression test: the full cascade on a fixed synthetic
page with deterministic fake models must produce byte-identical PAGE-XML
(after timestamp normalization) across refactors.

Regenerate deliberately with:  SBB_REGEN_GOLDEN=1 pytest tests/test_golden.py
"""

import dataclasses
import os
import re

import pytest

from sbb_textline_detection_tpu.core.config import (
    DEFAULT_CONFIG, DeskewConfig, ResizePolicy, RuntimeConfig)
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

from tests.test_detector_e2e import (
    FakePageModel, FakeRegionModel, FakeTextlineModel, _synthetic_page)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "synthetic_page.xml")


def _normalize(xml_text: str) -> str:
    return re.sub(r"<(Created|LastChange)>[^<]*</\1>",
                  r"<\1>TIMESTAMP</\1>", xml_text)


def test_golden_page_xml(tmp_path):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(100, 840, 1.2),
        deskew=DeskewConfig(coarse_steps=20, vertical_steps=10),
        runtime=RuntimeConfig(deskew_canvas=256))
    det = TextlineDetector(
        ModelBundle(FakePageModel(), FakeRegionModel(), FakeTextlineModel()),
        cfg)
    res = det.process_image(_synthetic_page(), "golden.png")
    out = res.write(str(tmp_path), "golden")
    with open(out) as f:
        produced = _normalize(f.read())

    if os.environ.get("SBB_REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(produced)
        if not os.environ.get("SBB_REGEN_GOLDEN"):
            pytest.skip("golden file generated; rerun to compare")
        return

    with open(GOLDEN) as f:
        expected = f.read()
    assert produced == expected, (
        "PAGE-XML output changed; if intentional, regenerate with "
        "SBB_REGEN_GOLDEN=1 and explain the change in the commit")

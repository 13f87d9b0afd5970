"""Quality-eval harness tests (training/eval.py)."""

import dataclasses

import numpy as np
import pytest

from sbb_textline_detection_tpu.training import eval as eval_mod
from sbb_textline_detection_tpu.utils.synthetic import PageLayout


def test_mask_iou_perfect_and_disjoint():
    a = np.zeros((10, 10), np.uint8)
    a[2:5] = 1
    assert eval_mod.mask_iou(a, a, 2) == [1.0, 1.0]
    b = np.zeros_like(a)
    b[6:9] = 1
    per = eval_mod.mask_iou(a, b, 2)
    assert per[1] == 0.0
    assert 0 < per[0] < 1
    assert 0 < eval_mod.mean_iou(a, b, 2) < 1


def test_mean_iou_absent_class_is_ignored():
    a = np.zeros((4, 4), np.uint8)
    assert eval_mod.mean_iou(a, a, 3) == 1.0  # classes 1,2 absent -> NaN


def _result_with_regions(boxes_lines):
    """Fake PageResult: XML tree with TextRegion boxes + n TextLines."""
    import xml.etree.ElementTree as ET

    root = ET.Element("PcGts")
    page = ET.SubElement(root, "Page")
    for (x0, y0, x1, y1), n_lines in boxes_lines:
        r = ET.SubElement(page, "TextRegion")
        ET.SubElement(r, "Coords").set(
            "points", f"{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}")
        for _ in range(n_lines):
            l = ET.SubElement(r, "TextLine")
            ET.SubElement(l, "Coords").set("points", "0,0 1,0 1,1")

    class R:
        xml_tree = ET.ElementTree(root)

    return R()


def test_evaluate_layout_perfect_match():
    layout = PageLayout((0, 0, 100, 100),
                        [(10, 10, 90, 40), (10, 60, 90, 90)], [5, 4])
    res = _result_with_regions([((10, 10, 90, 40), 5),
                                ((10, 60, 90, 90), 4)])
    score = eval_mod.evaluate_layout(res, layout)
    assert score.region_recall == 1.0
    assert score.region_precision == 1.0
    assert score.mean_region_iou == pytest.approx(1.0)
    assert score.line_count_mae == 0.0


def test_evaluate_layout_miss_and_extra():
    layout = PageLayout((0, 0, 100, 100),
                        [(10, 10, 90, 40), (10, 60, 90, 90)], [5, 4])
    res = _result_with_regions([((10, 10, 90, 40), 3),
                                ((200, 200, 220, 230), 1)])
    score = eval_mod.evaluate_layout(res, layout)
    assert score.region_recall == 0.5
    assert score.region_precision == 0.5
    assert score.line_count_mae == 2.0


def test_evaluate_layout_no_predictions():
    layout = PageLayout((0, 0, 100, 100), [(10, 10, 90, 40)], [5])
    score = eval_mod.evaluate_layout(_result_with_regions([]), layout)
    assert score.region_recall == 0.0
    assert np.isnan(score.region_precision)

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


def test_rotate_points_matches_pil_rotation():
    """A dot rendered upright then page-rotated by PIL must land where
    rotate_points maps its upright coordinates."""
    import numpy as np
    from PIL import Image

    from sbb_textline_detection_tpu.utils.synthetic import rotate_points

    h, w = 400, 600
    img = np.zeros((h, w), np.uint8)
    img[100:104, 450:454] = 255
    out = np.asarray(Image.fromarray(img).rotate(
        7.0, resample=Image.NEAREST, fillcolor=0))
    ys, xs = np.nonzero(out)
    got = np.array([xs.mean(), ys.mean()])
    want = rotate_points(np.array([[452.0, 102.0]]), h, w, 7.0)[0]
    assert np.linalg.norm(got - want) < 3.0


def test_skewed_page_line_centers_on_ink():
    """Ground-truth line centers mapped through rotate_points must land on
    ink in the skewed render (validates the skew bookkeeping end to end)."""
    import numpy as np

    from sbb_textline_detection_tpu.utils import synthetic

    rng = np.random.default_rng(3)
    img, layout = synthetic.make_page(rng, 1200, 900, skew_deg=5.0)
    assert layout.skew_deg == 5.0 and layout.size == (1200, 900)
    assert layout.line_boxes, "line boxes missing"
    centers = np.array([[(x0 + x1) / 2, (y0 + y1) / 2]
                        for x0, y0, x1, y1 in layout.line_boxes])
    rot = synthetic.rotate_points(centers, 1200, 900, 5.0)
    dark = img[:, :, 0] < 128
    on_ink = [dark[int(round(y)), int(round(x))]
              for x, y in rot if 0 <= y < 1200 and 0 <= x < 900]
    # word gaps punch holes in strokes, so not every center is inked —
    # but the vast majority must be
    assert np.mean(on_ink) > 0.85


def test_line_recall_scores_covered_lines():
    import numpy as np

    from sbb_textline_detection_tpu.training import eval as eval_mod
    from sbb_textline_detection_tpu.utils.synthetic import PageLayout

    layout = PageLayout((0, 0, 100, 100), [(10, 10, 90, 90)], [2],
                        line_boxes=[(10, 10, 90, 20), (10, 40, 90, 50)],
                        skew_deg=0.0, size=(100, 100))
    # one polygon covering the first line only
    polys = [np.array([[5, 5], [95, 5], [95, 25], [5, 25]])]
    assert eval_mod._line_recall(polys, layout) == 0.5
    polys.append(np.array([[5, 35], [95, 35], [95, 55], [5, 55]]))
    assert eval_mod._line_recall(polys, layout) == 1.0

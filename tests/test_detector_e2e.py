"""End-to-end pipeline tests with deterministic fake segmentation models.

The fake models implement the SegmentationModel duck-type (predict_whole /
predict_tiled) with pixel rules, so the full heuristic cascade — border,
regions, textlines, deskew, line split, reading order, PAGE-XML — runs on a
synthetic page with known ground truth, without model weights or a TPU.
"""

import dataclasses
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from sbb_textline_detection_tpu.core.config import (
    DEFAULT_CONFIG, DeskewConfig, ResizePolicy, RuntimeConfig)
from sbb_textline_detection_tpu.models.runner import ModelBundle
from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector


class FakePageModel:
    def predict_whole(self, img):
        return np.ones(img.shape[:2], np.uint8)


class FakeRegionModel:
    """Text class (1) on solid paragraph blocks: the real region model
    predicts block-level masks (which survive the region stage's erode x3),
    so close the dark strokes into blocks with a generous window. The
    pipeline's fused post-prediction morphology arrives via `morph` (same
    duck-type as SegmentationModel.predict_tiled)."""

    def predict_tiled(self, img, margin_ratio=0.1, morph=()):
        from sbb_textline_detection_tpu.ops import morphology
        dark = (img[:, :, 0] < 128).astype(np.uint8)
        out = morphology.morph_close_host(dark, 41).astype(np.uint8)
        for op, k, it in morph or ():
            fn = (morphology.erode_host if op == "erode"
                  else morphology.dilate_host)
            out = fn(out, k, it)
        return out


class FakeTextlineModel:
    def predict_tiled(self, img, margin_ratio=0.1, morph=()):
        return (img[:, :, 0] < 128).astype(np.uint8)


def _synthetic_page(h=700, w=500):
    """White page, two paragraphs of dark 'text lines', upper and lower.

    Line height ~20 px at page scale (~24 px after the 1.2x working resize)
    mirrors real 300-DPI pages at the reference's 2800 px working height —
    thick enough to survive the deskew-crop erode x2 and the line-split
    morph open."""
    img = np.full((h, w, 3), 255, np.uint8)

    def paragraph(y0, n_lines, line_h=20, gap=45):
        for i in range(n_lines):
            y = y0 + i * gap
            img[y:y + line_h, 60:w - 60] = 20

    paragraph(60, 5)
    paragraph(400, 4)
    return img


def _parse(path):
    """Parse PAGE-XML and strip the default namespace: the writer emits
    xmlns="...2019-07-15" exactly like the reference (main.py:1916-1918), so
    compliant parsers report namespaced tags; tests assert on local names."""
    tree = ET.parse(path)
    for el in tree.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]
    return tree


@pytest.fixture(scope="module")
def detector():
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(small_page_height_threshold=100,
                            small_page_target_height=840,
                            large_page_scale=1.2),
        # keep the CPU test cheap: small deskew canvas, coarse angle grid
        deskew=DeskewConfig(coarse_steps=20, vertical_steps=10),
        runtime=RuntimeConfig(deskew_canvas=256),
    )
    models = ModelBundle(FakePageModel(), FakeRegionModel(), FakeTextlineModel())
    return TextlineDetector(models, cfg)


@pytest.fixture(scope="module")
def result(detector):
    return detector.process_image(_synthetic_page(), "synthetic.png")


def test_finds_two_regions(result):
    assert len(result.contours) == 2


def test_slopes_near_zero(result):
    for s in result.slopes:
        assert abs(s) < 3.0


def test_line_counts(result):
    counts = sorted(len(lines) for lines in result.textlines)
    # 5-line and 4-line paragraphs; the separator may merge/split by one
    assert counts[0] in (3, 4, 5)
    assert counts[1] in (4, 5, 6)


def test_xml_structure(result, tmp_path):
    path = result.write(str(tmp_path), "page0")
    tree = _parse(path)
    root = tree.getroot()
    assert root.tag == "PcGts"
    with open(path) as f:
        assert f'xmlns="{DEFAULT_CONFIG.pagexml.schema}"' in f.read()
    page = root.find("Page")
    assert page.get("imageHeight") == "700"
    assert page.get("imageWidth") == "500"
    border = page.find("Border/Coords")
    assert border is not None and border.get("points")
    group = page.find("ReadingOrder/OrderedGroup")
    assert group.get("id") == DEFAULT_CONFIG.pagexml.reading_order_group_id
    refs = group.findall("RegionRefIndexed")
    assert len(refs) == 2
    regions = page.findall("TextRegion")
    assert len(regions) == 2
    assert regions[0].get("id") == "r0"
    assert regions[0].get("type") == "paragraph"
    line_ids = [l.get("id") for r in regions for l in r.findall("TextLine")]
    assert line_ids == [f"l{i}" for i in range(len(line_ids))]
    # all coords parse and lie inside the original image bounds
    for r in regions:
        for coords in r.iter("Coords"):
            pts = [tuple(map(int, p.split(",")))
                   for p in coords.get("points").split()]
            for x, y in pts:
                assert 0 <= x <= 500
                assert 0 <= y <= 700


def test_reading_order_top_region_first(result, tmp_path):
    path = result.write(str(tmp_path), "page1")
    page = _parse(path).getroot().find("Page")
    regions = page.findall("TextRegion")
    # find region centroids in output space
    cys = []
    for r in regions:
        pts = [tuple(map(int, p.split(",")))
               for p in r.find("Coords").get("points").split()]
        cys.append(np.mean([p[1] for p in pts]))
    group = page.find("ReadingOrder/OrderedGroup")
    index_by_ref = {ref.get("regionRef"): int(ref.get("index"))
                    for ref in group.findall("RegionRefIndexed")}
    top_region = regions[int(np.argmin(cys))].get("id")
    assert index_by_ref[top_region] == 0


def test_never_crashes_on_garbage(detector, tmp_path):
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 255, (300, 200, 3)).astype(np.uint8)
    res = detector.process_image(noise, "noise.png")
    path = res.write(str(tmp_path), "noise")
    root = _parse(path).getroot()
    assert root.tag == "PcGts"


def test_blank_page_valid_xml(detector, tmp_path):
    blank = np.full((400, 300, 3), 255, np.uint8)
    res = detector.process_image(blank, "blank.png")
    path = res.write(str(tmp_path), "blank")
    root = _parse(path).getroot()
    assert root.tag == "PcGts"
    assert root.find("Page/Border/Coords") is not None


def _skewed_stripe_page(skew_deg, h=700, w=500, n=8, stripe_h=20, pitch=55):
    """White page, n full-width dark stripes, rotated like a crooked scan."""
    from PIL import Image
    img = np.full((h, w, 3), 255, np.uint8)
    for i in range(n):
        y = 80 + i * pitch
        img[y:y + stripe_h, 60:w - 60] = 20
    out = Image.fromarray(img).rotate(skew_deg, resample=Image.BILINEAR,
                                      fillcolor=(255, 255, 255))
    return np.asarray(out)


def test_skewed_page_triggers_deskew_and_straight_lines(detector):
    """A +4° crooked scan must drive the deskew sweep to a nonzero negative
    correction angle and still split every stripe into its own line
    (reference behavior under skew: main.py:1601-1718 + 1472-1517)."""
    page = _skewed_stripe_page(4.0)
    res = detector.process_image(page, "skewed.png")
    assert len(res.contours) == 1
    assert len(res.slopes) == 1
    # coarse grid in the test fixture is 50/19 = 2.6°; the corrector for a
    # +4° CCW rotation is the nearest grid angles around -4
    assert -7.0 <= res.slopes[0] <= -1.5, res.slopes
    assert len(res.textlines[0]) == 8
    # emitted quads must track the skew: for a CCW-rotated page the right
    # end of each line sits higher (smaller y) than the left end. Corner
    # order is (up-left, up-right, down-right, down-left) — main.py:812-815.
    quad = res.textlines[0][0]
    assert quad[1, 1] < quad[0, 1], quad


def _vertical_stripe_page(h=700, w=500):
    img = np.full((h, w, 3), 255, np.uint8)
    # stripe gap (25 px page scale -> 30 working) stays under the fake
    # region model's 41-px closing window so the column reads as ONE region
    for i in range(5):
        x = 140 + i * 45
        img[60:h - 60, x:x + 20] = 20
    return img


def test_vertical_text_page_takes_vertical_path(detector):
    """Vertical stripes: the deskew sweep's |angle|>15 re-sweep lands in
    [-90,-50] (main.py:1669-1714) and, with the default vertical_axis_fix
    (DEVIATIONS #14), the now-horizontal rotated patch is split with the
    HORIZONTAL peak logic — one line per stripe — instead of the
    reference's self-defeating vertical variant (main.py:1020 profiles the
    axis perpendicular to the rotated text)."""
    res = detector.process_image(_vertical_stripe_page(), "vertical.png")
    assert len(res.contours) == 1
    slope = res.slopes[0]
    assert abs(slope) > DEFAULT_CONFIG.deskew.vertical_line_split_abs, slope
    assert -95.0 <= slope <= -50.0, slope
    assert 4 <= len(res.textlines[0]) <= 6, len(res.textlines[0])


def test_vertical_text_reference_faithful_flag(detector):
    """With vertical_axis_fix=False the reference-faithful vertical path is
    preserved verbatim and self-defeats upstream: the mask is first rotated
    BY the slope (main.py:1485), turning vertical lines horizontal, then
    seperate_lines_vertical profiles axis=0 (main.py:1020), which is flat
    for horizontal content; the degenerate profile hits the unbound
    single-peak branch (main.py:1298-1301) or yields no peaks, and the
    blanket except returns no lines (main.py:1520-1522). Parity assertion:
    the vertical sweep fired (slope ~ -90) and zero lines were emitted."""
    from sbb_textline_detection_tpu.core.config import LineSplitConfig
    cfg = dataclasses.replace(
        detector.config,
        line_split=dataclasses.replace(LineSplitConfig(),
                                       vertical_axis_fix=False))
    det_ref = TextlineDetector(detector.models, cfg)
    res = det_ref.process_image(_vertical_stripe_page(), "vertical.png")
    assert len(res.contours) == 1
    slope = res.slopes[0]
    assert -95.0 <= slope <= -50.0, slope
    assert res.textlines[0] == []

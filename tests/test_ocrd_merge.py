"""Tests for the OCR-D merge layer (ocrd/merge.py) and polygon ops
(ops/polygon.py) — the framework-free core of reference C19/C20."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from sbb_textline_detection_tpu.ocrd import merge
from sbb_textline_detection_tpu.ops import polygon as polyops

NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"


# -- polygon ops ---------------------------------------------------------------

def test_convex_hull_square_with_interior():
    pts = [[0, 0], [10, 0], [10, 10], [0, 10], [5, 5], [2, 3]]
    hull = polyops.convex_hull(np.asarray(pts, float))
    assert len(hull) == 4
    assert abs(abs(polyops.polygon_area_signed(hull)) - 100) < 1e-9


def test_is_convex():
    assert polyops.is_convex(np.asarray([[0, 0], [4, 0], [4, 4], [0, 4]], float))
    assert not polyops.is_convex(
        np.asarray([[0, 0], [4, 0], [2, 2], [4, 4], [0, 4]], float))


def test_is_simple_detects_bowtie():
    bowtie = np.asarray([[0, 0], [4, 4], [4, 0], [0, 4]], float)
    assert not polyops.is_simple(bowtie)
    square = np.asarray([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    assert polyops.is_simple(square)


def test_make_valid_repairs_bowtie_via_hull():
    bowtie = np.asarray([[0, 0], [4, 4], [4, 0], [0, 4]], float)
    fixed = polyops.make_valid(bowtie)
    assert polyops.is_simple(fixed)
    assert len(fixed) >= 3


def test_clip_convex_basic():
    subject = np.asarray([[-2, 1], [6, 1], [6, 3], [-2, 3]], float)
    clip = np.asarray([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    out = polyops.clip_convex(subject, clip)
    assert out is not None
    assert abs(abs(polyops.polygon_area_signed(out)) - 8.0) < 1e-6
    assert out[:, 0].min() >= -1e-9 and out[:, 0].max() <= 4 + 1e-9


def test_polygon_for_parent_inside_unchanged():
    child = np.asarray([[1, 1], [3, 1], [3, 3], [1, 3]], float)
    parent = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    out = polyops.polygon_for_parent(child, parent)
    np.testing.assert_allclose(out, child)


def test_polygon_for_parent_outside_none():
    child = np.asarray([[20, 20], [30, 20], [30, 30], [20, 30]], float)
    parent = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert polyops.polygon_for_parent(child, parent) is None


def test_polygon_for_parent_partial_clips():
    child = np.asarray([[5, 5], [15, 5], [15, 8], [5, 8]], float)
    parent = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    out = polyops.polygon_for_parent(child, parent)
    assert out is not None
    assert out[:, 0].max() <= 10 + 1e-9
    assert abs(abs(polyops.polygon_area_signed(out)) - 15.0) < 1e-6


# -- merge ---------------------------------------------------------------------

def _target_page(h=1000, w=800, with_old=True):
    root = ET.Element(f"{{{NS}}}PcGts")
    page = ET.SubElement(root, f"{{{NS}}}Page")
    page.set("imageHeight", str(h))
    page.set("imageWidth", str(w))
    if with_old:
        b = ET.SubElement(page, f"{{{NS}}}Border")
        ET.SubElement(b, f"{{{NS}}}Coords").set("points", "0,0 1,0 1,1 0,1")
        ro = ET.SubElement(page, f"{{{NS}}}ReadingOrder")
        ET.SubElement(ro, f"{{{NS}}}OrderedGroup").set("id", "old")
        tr = ET.SubElement(page, f"{{{NS}}}TextRegion")
        tr.set("id", "old_r")
        ET.SubElement(tr, f"{{{NS}}}Coords").set("points", "0,0 2,0 2,2 0,2")
    return root


def _detection(border="50,50 750,50 750,950 50,950",
               regions=(("r0", "100,100 700,100 700,400 100,400",
                         [("l0", "120,120 680,120 680,160 120,160")]),)):
    root = ET.Element("PcGts")
    page = ET.SubElement(root, "Page")
    page.set("imageHeight", "1000")
    page.set("imageWidth", "800")
    b = ET.SubElement(page, "Border")
    ET.SubElement(b, "Coords").set("points", border)
    ro = ET.SubElement(page, "ReadingOrder")
    og = ET.SubElement(ro, "OrderedGroup")
    og.set("id", "ro_new")
    for rid, pts, lines in regions:
        ref = ET.SubElement(og, "RegionRefIndexed")
        ref.set("regionRef", rid)
        tr = ET.SubElement(page, "TextRegion")
        tr.set("id", rid)
        ET.SubElement(tr, "Coords").set("points", pts)
        for lid, lpts in lines:
            tl = ET.SubElement(tr, "TextLine")
            tl.set("id", lid)
            ET.SubElement(tl, "Coords").set("points", lpts)
    return root


def test_merge_replaces_all_sections():
    target = _target_page()
    merge.merge_detection_into_page(target, _detection())
    page = merge.find_child(target, "Page")
    border = merge.find_child(page, "Border")
    assert border is not None
    assert merge.find_child(border, "Coords").get("points").startswith("50,50")
    ro = merge.find_child(page, "ReadingOrder")
    assert merge.find_child(ro, "OrderedGroup").get("id") == "ro_new"
    regions = merge.find_children(page, "TextRegion")
    assert [r.get("id") for r in regions] == ["r0"]
    # namespace of merged elements matches the target document
    assert border.tag == f"{{{NS}}}Border"
    lines = merge.find_children(regions[0], "TextLine")
    assert [l.get("id") for l in lines] == ["l0"]


def test_merge_clips_region_to_border():
    det = _detection(regions=(
        ("r0", "600,100 790,100 790,400 600,400",  # pokes past border x=750
         [("l0", "610,120 780,120 780,160 610,160")]),))
    target = _target_page()
    merge.merge_detection_into_page(target, det)
    page = merge.find_child(target, "Page")
    region = merge.find_children(page, "TextRegion")[0]
    poly = merge.points_to_polygon(
        merge.find_child(region, "Coords").get("points"))
    assert poly[:, 0].max() <= 750
    line = merge.find_children(region, "TextLine")[0]
    lpoly = merge.points_to_polygon(
        merge.find_child(line, "Coords").get("points"))
    assert lpoly[:, 0].max() <= 750


def test_merge_drops_region_outside_border():
    det = _detection(regions=(
        ("r0", "100,100 700,100 700,400 100,400", []),
        ("r_out", "760,960 790,960 790,990 760,990", []),))
    target = _target_page()
    merge.merge_detection_into_page(target, det)
    page = merge.find_child(target, "Page")
    ids = [r.get("id") for r in merge.find_children(page, "TextRegion")]
    assert ids == ["r0"]


def test_merge_applies_inverse_transform():
    # Page transform: absolute -> page frame is a +10/+20 translation, so
    # detection coords (page frame) map back via the inverse (-10/-20)...
    # i.e. absolute = page - (10, 20).
    t = np.asarray([[1, 0, 10], [0, 1, 20], [0, 0, 1]], float)
    target = _target_page()
    merge.merge_detection_into_page(target, _detection(), transform=t)
    page = merge.find_child(target, "Page")
    border = merge.find_child(page, "Border")
    poly = merge.points_to_polygon(
        merge.find_child(border, "Coords").get("points"))
    assert poly[0][0] == 40 and poly[0][1] == 30


def test_merge_without_detection_border_keeps_page_frame():
    det = _detection()
    d_page = merge.find_child(det, "Page")
    d_page.remove(merge.find_child(d_page, "Border"))
    target = _target_page()
    merge.merge_detection_into_page(target, det)
    page = merge.find_child(target, "Page")
    assert merge.find_child(page, "Border") is None
    assert len(merge.find_children(page, "TextRegion")) == 1


def test_merge_detector_output_roundtrip(tmp_path):
    """End-to-end: a real detector PAGE-XML (from the e2e fake pipeline)
    merges into a workspace page without loss."""
    import dataclasses
    import sys
    sys.path.insert(0, str(tmp_path))  # noqa -- no-op, keeps lint quiet

    from tests.test_detector_e2e import (  # type: ignore
        FakePageModel, FakeRegionModel, FakeTextlineModel, _synthetic_page)
    from sbb_textline_detection_tpu.core.config import (
        DEFAULT_CONFIG, DeskewConfig, ResizePolicy, RuntimeConfig)
    from sbb_textline_detection_tpu.models.runner import ModelBundle
    from sbb_textline_detection_tpu.pipeline.detector import TextlineDetector

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        resize=ResizePolicy(100, 840, 1.2),
        deskew=DeskewConfig(coarse_steps=20, vertical_steps=10),
        runtime=RuntimeConfig(deskew_canvas=256))
    det = TextlineDetector(
        ModelBundle(FakePageModel(), FakeRegionModel(), FakeTextlineModel()),
        cfg)
    res = det.process_image(_synthetic_page(), "x.png")
    target = _target_page(h=700, w=500, with_old=False)
    merge.merge_detection_into_page(target, res.xml_tree.getroot())
    page = merge.find_child(target, "Page")
    regions = merge.find_children(page, "TextRegion")
    assert len(regions) == 2
    assert sum(len(merge.find_children(r, "TextLine")) for r in regions) >= 7


def test_merge_keeps_alternative_image_before_border():
    """PAGE schema: AlternativeImage children precede Border; OCR-D
    workspaces carry them after binarization steps. Border/ReadingOrder
    must be inserted after them, not at index 0."""
    target = _target_page(with_old=False)
    page = merge.find_child(target, "Page")
    for fname in ("bin.png", "gray.png"):
        ai = ET.SubElement(page, f"{{{NS}}}AlternativeImage")
        ai.set("filename", fname)
    merge.merge_detection_into_page(target, _detection())
    tags = [c.tag.split("}")[-1] for c in page]
    assert tags[:4] == ["AlternativeImage", "AlternativeImage", "Border",
                        "ReadingOrder"]
    assert tags[4:] == ["TextRegion"]


def test_add_processing_step_metadata_roundtrip():
    """The reference records a processing-step agent via ocrd core's
    `self.add_metadata(pcgts)` (ocrd_cli.py:132); the framework-free
    equivalent must create the MetadataItem with tool name, step, version,
    and parameters, and survive a serialize/parse round trip."""
    target = _target_page(with_old=False)
    merge.merge_detection_into_page(target, _detection())
    merge.add_processing_step_metadata(
        target, executable="ocrd-sbb-textline-detector-tpu",
        version="1.0.0", step="layout/segmentation/region",
        parameters={"model": "/models"})
    # round-trip through serialization
    reparsed = ET.fromstring(ET.tostring(target, encoding="unicode"))
    md = merge.find_child(reparsed, "Metadata")
    assert md is not None
    items = merge.find_children(md, "MetadataItem")
    assert len(items) == 1
    item = items[0]
    assert item.get("type") == "processingStep"
    assert item.get("name") == "layout/segmentation/region"
    assert item.get("value") == "ocrd-sbb-textline-detector-tpu"
    labels = merge.find_children(item, "Labels")
    params = [l for l in labels if l.get("externalId") == "parameters"]
    assert len(params) == 1
    label = merge.find_children(params[0], "Label")[0]
    assert label.get("type") == "model" and label.get("value") == "/models"
    versions = [l for l in labels if l.get("externalId") == "version"]
    assert merge.find_children(versions[0], "Label")[0].get("value") == "1.0.0"
    # Metadata is the FIRST PcGts child (PAGE schema order) and inherits
    # the document namespace
    assert merge.local(reparsed[0].tag) == "Metadata"
    assert item.tag == f"{{{NS}}}MetadataItem"


def test_add_processing_step_metadata_appends_to_existing():
    target = _target_page(with_old=False)
    md = ET.Element(f"{{{NS}}}Metadata")
    ET.SubElement(md, f"{{{NS}}}Creator").text = "existing"
    target.insert(0, md)
    merge.add_processing_step_metadata(
        target, executable="x", version="0", step="s", parameters={})
    mds = merge.find_children(target, "Metadata")
    assert len(mds) == 1
    assert merge.find_child(mds[0], "Creator").text == "existing"
    assert len(merge.find_children(mds[0], "MetadataItem")) == 1

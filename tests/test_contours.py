"""Geometry parity tests against cv2 (oracle only)."""

import cv2
import numpy as np
import pytest

from sbb_textline_detection_tpu.ops import contours as C

RNG = np.random.default_rng(2)


def _blob_mask():
    mask = np.zeros((120, 160), np.uint8)
    cv2.circle(mask, (40, 40), 20, 1, -1)
    cv2.rectangle(mask, (90, 20), (140, 70), 1, -1)
    cv2.ellipse(mask, (70, 95), (35, 12), 15, 0, 360, 1, -1)
    return mask


def test_find_contours_counts_and_geometry_match_cv2():
    mask = _blob_mask()
    ours = C.find_contours(mask)
    ref, _ = cv2.findContours((mask * 255).astype(np.uint8),
                              cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    assert len(ours) == len(ref)
    ours_stats = sorted(
        (C.bounding_rect(c), round(C.polygon_area(c))) for c in ours)
    ref_stats = sorted(
        (cv2.boundingRect(c), round(cv2.contourArea(c))) for c in ref)
    for (obb, oa), (rbb, ra) in zip(ours_stats, ref_stats):
        assert obb == rbb
        # traced boundaries differ by sub-pixel vertex choices; areas of page
        # scale blobs must agree within a tight relative tolerance
        assert abs(oa - ra) <= 0.02 * max(ra, 1)


def test_find_contours_tiny_components():
    mask = np.zeros((10, 10), np.uint8)
    mask[2, 2] = 1                       # single pixel
    mask[5, 5:7] = 1                     # two pixels
    mask[8, 1:5] = 1                     # 1px-high line
    out = C.find_contours(mask)
    assert len(out) == 3
    for chain in out:
        assert chain.ndim == 2 and chain.shape[1] == 2


def test_polygon_area_matches_cv2_contour_area():
    pts = np.array([[0, 0], [10, 0], [10, 5], [0, 5]])
    assert C.polygon_area(pts) == cv2.contourArea(pts.astype(np.int32))
    tri = np.array([[0, 0], [7, 1], [3, 9]])
    assert C.polygon_area(tri) == cv2.contourArea(tri.astype(np.int32))


def test_centroid_matches_cv2_moments():
    pts = np.array([[2, 3], [20, 4], [25, 18], [7, 22], [1, 10]], np.int32)
    m = cv2.moments(pts)
    cx_ref = m["m10"] / (m["m00"] + 1e-32)
    cy_ref = m["m01"] / (m["m00"] + 1e-32)
    cx, cy = C.polygon_centroid(pts)
    assert abs(abs(cx) - abs(cx_ref)) < 1e-9
    assert abs(abs(cy) - abs(cy_ref)) < 1e-9


def test_points_in_polygon_matches_cv2_sign():
    poly = np.array([[10, 10], [60, 12], [55, 50], [20, 45]], np.int32)
    qx = RNG.uniform(0, 70, 500)
    qy = RNG.uniform(0, 60, 500)
    ours = C.points_in_polygon(poly, qx, qy)
    cnt = poly.reshape(-1, 1, 2)
    ref = np.array([
        cv2.pointPolygonTest(cnt, (float(x), float(y)), True) >= 0
        for x, y in zip(qx, qy)
    ])
    # boundary-grazing points may differ by float epsilon; demand 99% match
    assert np.mean(ours == ref) > 0.99


def test_fill_polygon_close_to_cv2():
    poly = np.array([[10, 10], [60, 12], [55, 50], [20, 45]], np.int32)
    ref = np.zeros((60, 70, 3))
    ref = cv2.fillPoly(ref, pts=[poly], color=(255, 255, 255))[:, :, 0] > 0
    ours = C.fill_polygon(poly, 60, 70) > 0
    # identical up to boundary pixels
    disagree = np.logical_xor(ref, ours).sum()
    assert disagree <= 0.02 * ref.sum()


def test_roundtrip_component_trace_fill():
    mask = _blob_mask()
    for chain in C.find_contours(mask):
        filled = C.fill_polygon(chain, *mask.shape)
        x, y, w, h = C.bounding_rect(chain)
        sub_orig = mask[y:y + h, x:x + w] > 0
        sub_fill = filled[y:y + h, x:x + w] > 0
        iou = (sub_orig & sub_fill).sum() / (sub_orig | sub_fill).sum()
        assert iou > 0.93

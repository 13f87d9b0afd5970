"""Parity tests for morphology / threshold / resize / rotate against cv2
(cv2 is used strictly as a test oracle; product code never imports it)."""

import cv2
import numpy as np
import pytest

from sbb_textline_detection_tpu.ops import morphology, resize, rotate, threshold

RNG = np.random.default_rng(1)
KERNEL = np.ones((5, 5), np.uint8)


@pytest.mark.parametrize("iterations", [1, 2, 3, 4, 6])
def test_dilate_matches_cv2(iterations):
    img = (RNG.random((64, 80)) < 0.1).astype(np.uint8) * 255
    ref = cv2.dilate(img, KERNEL, iterations=iterations)
    np.testing.assert_array_equal(morphology.dilate_host(img, 5, iterations), ref)
    np.testing.assert_array_equal(
        np.asarray(morphology.dilate(img, 5, iterations)), ref)


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_erode_matches_cv2(iterations):
    img = (RNG.random((64, 80)) < 0.7).astype(np.uint8) * 255
    ref = cv2.erode(img, KERNEL, iterations=iterations)
    np.testing.assert_array_equal(morphology.erode_host(img, 5, iterations), ref)
    np.testing.assert_array_equal(
        np.asarray(morphology.erode(img, 5, iterations)), ref)


def test_open_close_match_cv2():
    img = (RNG.random((60, 60)) < 0.4).astype(np.uint8) * 255
    ref_open = cv2.morphologyEx(img, cv2.MORPH_OPEN, KERNEL)
    ref_close = cv2.morphologyEx(img, cv2.MORPH_CLOSE, KERNEL)
    np.testing.assert_array_equal(morphology.morph_open_host(img), ref_open)
    np.testing.assert_array_equal(morphology.morph_close_host(img), ref_close)
    np.testing.assert_array_equal(np.asarray(morphology.morph_open(img)), ref_open)
    np.testing.assert_array_equal(np.asarray(morphology.morph_close(img)), ref_close)


def test_morphology_on_label_maps_matches_cv2():
    # The region stage erodes/dilates a 3-channel *label* image (values 0..2).
    img = RNG.integers(0, 3, size=(50, 40, 3)).astype(np.uint8)
    ref_e = cv2.erode(img, KERNEL, iterations=3)
    ref_d = cv2.dilate(ref_e, KERNEL, iterations=4)
    ours = morphology.dilate_host(morphology.erode_host(img, 5, 3), 5, 4)
    np.testing.assert_array_equal(ours, ref_d)


@pytest.mark.parametrize("kind", ["bimodal", "uniform", "constant", "photo"])
def test_otsu_matches_cv2(kind):
    if kind == "bimodal":
        img = np.concatenate([
            RNG.normal(60, 10, 2000), RNG.normal(190, 12, 3000)
        ]).clip(0, 255).astype(np.uint8).reshape(50, 100)
    elif kind == "uniform":
        img = RNG.integers(0, 256, size=(50, 100)).astype(np.uint8)
    elif kind == "constant":
        img = np.full((20, 20), 128, np.uint8)
    else:
        x = np.linspace(0, 255, 100)
        img = (x[None, :] + RNG.normal(0, 25, (50, 100))).clip(0, 255).astype(np.uint8)
    ref_t, ref_bin = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert threshold.otsu_threshold_host(img) == int(ref_t)
    np.testing.assert_array_equal(threshold.otsu_binarize_host(img), ref_bin)
    assert int(threshold.otsu_threshold(img)) == int(ref_t)


def test_otsu_copy_channel0_bug_preserved():
    img = RNG.integers(0, 256, size=(40, 40, 3)).astype(np.uint8)
    out = threshold.otsu_copy_host(img)
    ref_t, ref0 = cv2.threshold(img[:, :, 0], 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    for c in range(3):
        np.testing.assert_array_equal(out[:, :, c], ref0)
    np.testing.assert_array_equal(np.asarray(threshold.otsu_copy(img)), out)


@pytest.mark.parametrize("shape,out_hw", [
    ((100, 80), (2800, 2240)),
    ((37, 53), (20, 30)),
    ((64, 64, 3), (100, 50)),
])
def test_resize_nearest_matches_cv2(shape, out_hw):
    img = RNG.integers(0, 256, size=shape).astype(np.uint8)
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(resize.resize_nearest_host(img, *out_hw), ref)
    np.testing.assert_array_equal(np.asarray(resize.resize_nearest(img, *out_hw)), ref)


@pytest.mark.parametrize("angle", [0.0, 7.3, -12.0, 45.0, -80.0])
def test_rotate_cubic_close_to_cv2(angle):
    img = np.zeros((80, 100), np.uint8)
    img[20:30, 10:90] = 255
    img[50:58, 30:70] = 255
    ref = cv2.warpAffine(
        img,
        cv2.getRotationMatrix2D((100 // 2, 80 // 2), angle, 1.0),
        (100, 80),
        flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_REPLICATE,
    ).astype(np.float32)
    ours = np.asarray(rotate.rotate_image(img.astype(np.float32), angle, order=3))
    # cv2 uses 5-bit fixed point; allow small interpolation differences and
    # compare where the fields agree to within a few gray levels.
    diff = np.abs(ours.clip(0, 255) - ref)
    assert np.mean(diff) < 2.0
    assert np.percentile(diff, 99) < 40.0  # only sharp-edge pixels may differ


def test_rotation_matrix_host_matches_cv2():
    for angle in [0.0, 13.7, -45.0, 90.0]:
        ref = cv2.getRotationMatrix2D((64 // 2, 48 // 2), angle, 1.0)
        ours = rotate.rotation_matrix_host(angle, 64, 48)
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_rotate_identity():
    img = RNG.random((32, 40)).astype(np.float32)
    out = np.asarray(rotate.rotate_image(img, 0.0, order=3))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_pack_roundtrips():
    """2-bit and 1-bit pack/unpack in both directions (device pack -> host
    unpack for mask transfers; host pack -> device unpack for the deskew
    canvas uploads)."""
    import numpy as np

    from sbb_textline_detection_tpu.ops import pack as pack_ops

    rng = np.random.default_rng(0)
    for shape in [(7,), (64,), (13, 21), (3, 33, 9)]:
        labels = rng.integers(0, 4, shape).astype(np.uint8)
        packed = np.asarray(pack_ops.pack2_device(labels))
        np.testing.assert_array_equal(
            pack_ops.unpack2_host(packed, shape), labels)

        bits = rng.integers(0, 2, shape).astype(np.uint8)
        packed1 = np.asarray(pack_ops.pack1_device(bits))
        np.testing.assert_array_equal(
            pack_ops.unpack1_host(packed1, shape), bits)
        # device pack == host pack (same little-endian layout)
        np.testing.assert_array_equal(packed1, pack_ops.pack1_host(bits))
        np.testing.assert_array_equal(
            np.asarray(pack_ops.unpack1_device(packed1, shape)), bits)

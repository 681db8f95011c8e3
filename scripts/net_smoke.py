"""First-egress shakedown (VERDICT r4 item 9).

Every network client in this repo — WMS/3DEP tiling + retries, the
USWTDB REST fetch, the HSDS/h5pyd WTK reads — has only ever executed
against recorded fixtures and mocks (this container has zero egress).
When a networked environment appears, run

    python scripts/net_smoke.py             # live, needs egress
    python scripts/net_smoke.py --rehearse  # anywhere: same assertions
                                            # against the replay fixtures

Live mode hits each service ONCE, minimally (one small DEM tile, one
turbine bbox, one WTK slice), and asserts the protocol assumptions the
recorded fixtures encode:

- 3DEP: GetCapabilities is a namespaced WMS 1.3.0 document whose layer
  tree contains '3DEPElevation:None' inheriting EPSG:4326
  (tests/fixtures/http/threedep_getcapabilities.xml); GetMap returns a
  GeoTIFF our in-repo decoder reads; the mosaic lands on the requested
  grid with plausible elevations. Reference: ssrs/terrain/threedep.py,
  ssrs/terrain/wms.py:105-125.
- USWTDB: the PostgREST select returns JSON rows with exactly the 8
  columns the client requests, filterable by bbox + hub height
  (tests/fixtures/http/uswtdb_turbines.json). Reference:
  ssrs/turbines.py:30-46.
- HSDS: the h5pyd domain opens, lists layers, 'coordinates' is (n, 2)
  [lat, lon], wind datasets carry a scale_factor attribute
  (tests/http_replay.py::make_hsds_stub). Reference:
  ssrs/wtk/wtk.py:135-146. Skipped (not failed) when h5pyd or .hscfg
  credentials are absent — the API key is per-user.

Rehearse mode replays the SAME check functions against the fixture
transport, proving the assertions themselves before the first real run.

Prints one JSON line: {"check": {"status": "ok|fail|skipped", ...}}.
Exit 0 iff nothing failed (skips allowed).
"""

import argparse
import json
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

# Altamont Pass: known turbines, moderate relief, small
BNDS = (-121.70, 37.70, -121.60, 37.78)          # (w, s, e, n) lonlat
TURBINE_BNDS = (-121.9, 37.5, -121.4, 37.9)

USWTDB_COLUMNS = ['t_state', 'p_name', 'p_year', 't_cap', 't_hh',
                  't_rd', 'xlong', 'ylat']


# ---- the checks (identical in live and rehearse mode) ----------------------

def check_threedep(res=1. / 1200.):
    """One small DEM mosaic through the full client stack."""
    from ssrs_tpu.data import ThreeDEP, read_geotiff
    with tempfile.TemporaryDirectory() as tmp:
        fpath = os.path.join(tmp, 'dem.tif')
        client = ThreeDEP('DEM', BNDS, fpath, res=res)
        assert client.layer_name == '3DEPElevation:None'
        client.download()
        info = read_geotiff(fpath)
    nrow = round((BNDS[3] - BNDS[1]) / res)
    ncol = round((BNDS[2] - BNDS[0]) / res)
    assert info.data.shape == (nrow, ncol), info.data.shape
    np.testing.assert_allclose(info.bounds, BNDS, atol=res)
    finite = np.isfinite(info.data)
    assert finite.mean() > 0.99, 'mostly-nodata DEM tile'
    vals = info.data[finite]
    assert -100. < float(vals.min()) and float(vals.max()) < 9000., \
        (vals.min(), vals.max())
    return {'shape': list(info.data.shape),
            'elev_range_m': [round(float(vals.min()), 1),
                             round(float(vals.max()), 1)]}


def check_uswtdb():
    """One bbox through the USWTDB REST client."""
    from ssrs_tpu.data import TurbinesUSWTB
    turbs = TurbinesUSWTB(TURBINE_BNDS, out_fpath=None)
    assert turbs.dframe is not None, \
        'USWTDB fetch failed (client swallowed the exception)'
    missing = [c for c in USWTDB_COLUMNS if c not in turbs.dframe.columns]
    assert not missing, f'columns missing from response: {missing}'
    assert len(turbs.dframe) > 0, 'no turbines in a known wind-farm bbox'
    assert float(turbs.dframe['t_hh'].min()) >= 50., 'hub-height filter'
    return {'turbines': int(len(turbs.dframe)),
            'projects': len(turbs.get_project_names())}


def check_hsds():
    """Open the AWS/HSDS WTK domain, read one tiny slice."""
    from ssrs_tpu.data.wtksource import WtkSource
    src = WtkSource('AWS')          # import h5pyd + probe first domain
    assert 'coordinates' in src.valid_layers
    layer = next(l for l in src.valid_layers
                 if l.startswith('windspeed_'))
    with src.hsds.File(src.file_names[0], mode='r') as fobj:
        coords = fobj['coordinates'][:4]
        assert coords.shape == (4, 2), coords.shape
        lat, lon = float(coords[0][0]), float(coords[0][1])
        assert 15. < lat < 60. and -140. < lon < -60., (lat, lon)
        dset = fobj[layer]
        scale = dset.attrs['scale_factor']
        assert float(scale) > 0.
        sample = np.asarray(dset[0, :4], np.float64) / float(scale)
        assert np.isfinite(sample).all()
        assert 0. <= float(sample.max()) < 150., sample
    return {'layers': len(src.valid_layers), 'probe_layer': layer,
            'scale_factor': float(scale)}


# ---- rehearse wiring -------------------------------------------------------

def _rehearse_patches():
    """Install the replay transport + h5pyd stub from tests/ and return
    the monkeypatch handle (undo() to restore)."""
    from pytest import MonkeyPatch
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), '..', 'tests'))
    from http_replay import (FakeResponse, FakeWMSServer, ReplayTransport,
                             fixture_bytes, make_hsds_stub)
    mp = MonkeyPatch()
    tmp = tempfile.mkdtemp(prefix='net_smoke_')
    transport = ReplayTransport().install(mp)
    transport.add('GetCapabilities', FakeResponse(
        200, fixture_bytes('threedep_getcapabilities.xml'), 'text/xml'))
    transport.add('GetMap', FakeWMSServer(tmp))
    transport.add(lambda url, p: 'uswtdb' in url, FakeResponse(
        200, fixture_bytes('uswtdb_turbines.json'), 'application/json'))

    # WY fixture turbines: point the bbox checks at their region
    global TURBINE_BNDS
    TURBINE_BNDS = (-106.5, 42.5, -105.5, 43.2)

    # h5pyd stub: 4 CONUS points, one windspeed layer with scale 100
    coords = np.array([[42.9, -106.2], [42.8, -106.1],
                       [43.0, -106.0], [42.7, -106.3]])
    t, n = 3, 4
    datasets = {'windspeed_100m':
                (np.arange(t * n).reshape(t, n) * 37 % 900 + 100)}
    stub = make_hsds_stub(coords, datasets, {'windspeed_100m': 100.},
                          require_hscfg=False)
    mp.setitem(sys.modules, 'h5pyd', stub)
    return mp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rehearse', action='store_true',
                    help='run the same checks against replay fixtures')
    args = ap.parse_args()

    mp = _rehearse_patches() if args.rehearse else None
    results = {}
    try:
        for name, check in [('threedep', check_threedep),
                            ('uswtdb', check_uswtdb),
                            ('hsds', check_hsds)]:
            try:
                detail = check()
                results[name] = {'status': 'ok', **detail}
            except (ImportError, FileNotFoundError) as exc:
                # missing module / .hscfg: environment, not code. HTTP
                # and connection errors deliberately do NOT land here —
                # requests exceptions subclass OSError, and classifying
                # a live 500/refused-connection as 'skipped' would
                # defeat the shakedown (it must flag protocol drift and
                # dead endpoints, not bury them)
                results[name] = {'status': 'skipped', 'reason': str(exc)}
            except Exception as exc:  # noqa: BLE001 — shakedown finding
                results[name] = {'status': 'fail', 'error': repr(exc),
                                 'trace': traceback.format_exc(limit=4)}
    finally:
        if mp is not None:
            mp.undo()

    results['mode'] = 'rehearse' if args.rehearse else 'live'
    print(json.dumps(results))
    if args.rehearse:
        # rehearse must not skip: the stubs are always present
        bad = [k for k, v in results.items()
               if isinstance(v, dict) and v.get('status') != 'ok']
        return 1 if bad else 0
    return 1 if any(isinstance(v, dict) and v.get('status') == 'fail'
                    for v in results.values()) else 0


if __name__ == '__main__':
    raise SystemExit(main())

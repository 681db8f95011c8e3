"""HTTP-transcript replay for the network clients.

The data clients (WMS/3DEP in ``ssrs_tpu/data/wms.py``, USWTDB in
``data/turbines.py``) speak to real services only through
``requests.get``.  This module replays service-shaped responses at that
boundary so the full client stack — URL/param construction, WMS 1.3.0
axis order, capabilities parsing, bounded retries
(reference semantics: ssrs/terrain/wms.py:105-125), GeoTIFF decode, tile
mosaic — runs against realistic bytes with zero network.

Transcript bodies live in ``tests/fixtures/http/``:

- ``threedep_getcapabilities.xml`` — WMS 1.3.0 capabilities shaped like
  the USGS 3DEPElevation ArcGIS WMSServer response (namespaced document,
  CRS inheritance from the parent Layer, the ``3DEPElevation:<layer>``
  names the reference's tables map onto, ssrs/terrain/threedep.py:27-56);
- ``wms_service_exception.xml`` — an OGC ServiceExceptionReport, the body
  a WMS server returns with HTTP 200 + an XML content type;
- ``uswtdb_turbines.json`` — a USWTDB v1 PostgREST page with the exact
  column ``select`` the client requests (ssrs/turbines.py:30-31).

GetMap responses are synthesized per request by :class:`FakeWMSServer`
from the client's own bbox/width/height parameters — the strongest check
of the request side: a wrong bbox axis order or tile grid produces a
mosaic that no longer matches the analytic elevation function.
"""

from __future__ import annotations

import io
import os
from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np
import requests

FIXTURES = os.path.join(os.path.dirname(__file__), 'fixtures', 'http')


def fixture_bytes(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), 'rb') as f:
        return f.read()


class FakeResponse:
    """Just enough of ``requests.Response`` for the clients."""

    def __init__(self, status_code: int = 200, content: bytes = b'',
                 content_type: str = 'application/octet-stream'):
        self.status_code = status_code
        self.content = content
        self.headers = {'Content-Type': content_type}

    def raise_for_status(self):
        if self.status_code >= 400:
            raise requests.exceptions.HTTPError(
                f'{self.status_code} Server Error', response=self)


Responder = Union[FakeResponse, Exception,
                  Callable[[str, dict], FakeResponse]]


class ReplayTransport:
    """Scripted stand-in for ``requests.get``.

    Rules are ``(predicate, responders)`` where ``predicate(url, params)``
    selects the rule and ``responders`` is a sequence consumed one response
    per matching request (the last entry repeats) — which is how the
    retry-then-succeed and retry-exhaustion scripts are written.  Every
    request is recorded in ``self.requests`` for assertions.
    """

    def __init__(self):
        self._rules: List[Tuple[Callable[[str, dict], bool],
                                List[Responder], List[int]]] = []
        self.requests: List[Tuple[str, dict]] = []

    def add(self, predicate: Union[str, Callable[[str, dict], bool]],
            responders: Union[Responder, Sequence[Responder]]) -> None:
        if isinstance(predicate, str):
            kind = predicate

            def predicate(url, params, _kind=kind):  # noqa: F811
                return (params or {}).get('request') == _kind
        if not isinstance(responders, (list, tuple)):
            responders = [responders]
        self._rules.append((predicate, list(responders), [0]))

    def get(self, url: str, params: Optional[dict] = None,
            timeout=None, **kwargs) -> FakeResponse:
        params = params or {}
        self.requests.append((url, dict(params)))
        for predicate, responders, cursor in self._rules:
            if predicate(url, params):
                resp = responders[min(cursor[0], len(responders) - 1)]
                cursor[0] += 1
                if isinstance(resp, Exception):
                    raise resp
                if callable(resp):
                    return resp(url, params)
                return resp
        raise AssertionError(
            f'ReplayTransport: no rule matches GET {url} params={params}')

    def count(self, kind: str) -> int:
        return sum(1 for _, p in self.requests if p.get('request') == kind)

    def install(self, monkeypatch) -> 'ReplayTransport':
        monkeypatch.setattr(requests, 'get', self.get)
        return self


def analytic_elevation(lon, lat):
    """Deterministic 'terrain' the fake server samples; smooth so bilinear
    details don't matter but varying enough that any tile/axis mixup shows."""
    return (1000. + 800. * np.sin(3. * np.asarray(lon))
            * np.cos(4. * np.asarray(lat))
            + 50. * np.asarray(lat)).astype(np.float32)


class FakeWMSServer:
    """Synthesizes WMS 1.3.0 GetMap GeoTIFF tiles from request params.

    Interprets the request exactly as a compliant server would: for
    version 1.3.0 + EPSG:4326 the BBOX is (lat_min, lon_min, lat_max,
    lon_max); the returned image is north-up (row 0 = northern edge) with
    pixel centers at half-cell offsets.
    """

    def __init__(self, tmpdir):
        self.tmpdir = str(tmpdir)
        self._n = 0

    def __call__(self, url: str, params: dict) -> FakeResponse:
        from ssrs_tpu.data.geotiff import write_geotiff
        assert params['version'] == '1.3.0'
        assert params['crs'].upper() == 'EPSG:4326'
        lat0, lon0, lat1, lon1 = map(float, params['bbox'].split(','))
        width, height = int(params['width']), int(params['height'])
        dx, dy = (lon1 - lon0) / width, (lat1 - lat0) / height
        lon = lon0 + (np.arange(width) + 0.5) * dx
        lat = lat1 - (np.arange(height) + 0.5) * dy  # row 0 = north
        data = analytic_elevation(lon[None, :], lat[:, None])
        self._n += 1
        fpath = os.path.join(self.tmpdir, f'tile{self._n}.tif')
        write_geotiff(fpath, data, (lon0, lat0, lon1, lat1), epsg=4326)
        with open(fpath, 'rb') as f:
            return FakeResponse(200, f.read(), 'image/tiff')


def make_hsds_stub(coords: np.ndarray, datasets: dict, scale: dict,
                   require_hscfg: bool = True):
    """Build an h5pyd-shaped module stub (HSDS domain semantics).

    ``coords``: (n, 2) [lat, lon] like WTK's ``coordinates`` dataset.
    ``datasets``: name -> (T, n) raw int-ish arrays (pre-scale_factor).
    ``scale``: name -> scale_factor attr.

    Mimics the two h5pyd behaviors the client depends on: domain paths
    (``/nrel/wtk/conus/wtk_conus_$YEAR.h5``) rather than filesystem paths,
    and an OSError when no ``.hscfg`` credentials resolve — which is what
    the reference's probe converts into the API-key message
    (ssrs/wtk/wtksource.py:52-60).
    """
    import types

    class _Dataset:
        def __init__(self, arr, attrs):
            self._arr = np.asarray(arr)
            self.attrs = attrs

        def __getitem__(self, key):
            return self._arr[key]

    class File:
        _valid_domains = {f'/nrel/wtk/conus/wtk_conus_{y}.h5'
                          for y in range(2007, 2015)}

        def __init__(self, domain, mode='r', **kwargs):
            if require_hscfg and not (
                    os.path.exists('.hscfg')
                    or os.path.exists(os.path.expanduser('~/.hscfg'))):
                raise OSError(401, 'Unauthorized: no HSDS credentials')
            if domain not in self._valid_domains:
                raise FileNotFoundError(domain)
            self._groups = {'coordinates': _Dataset(coords, {})}
            for name, arr in datasets.items():
                self._groups[name] = _Dataset(
                    arr, {'scale_factor': scale.get(name, 1.0)})

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def __iter__(self):
            return iter(self._groups)

        def __getitem__(self, name):
            return self._groups[name]

    mod = types.ModuleType('h5pyd')
    mod.File = File
    return mod

"""Seasonal-mode pipeline tests: solar calculations, the seeded seasonal
datetime sampler, and a full multi-case seasonal Simulator run against the
LOCAL WTK fixture."""

import os
from datetime import date, datetime

import numpy as np
import pytest

from ssrs_tpu.utils import (conus_timezone_name,
                            get_seasonal_datetimes_list,
                            get_sunrise_sunset_time, utc_offset_hours)


def test_sunrise_sunset_wyoming_summer():
    """WY (~-106E, 42.8N) summer solstice: sunrise ~5:30-6:00, sunset
    ~20:30-21:00 MDT (UTC-6, daylight time)."""
    srise, sset = get_sunrise_sunset_time((-106.21, 42.78),
                                          date(2012, 6, 20))
    assert 5 <= srise.hour <= 6
    assert 20 <= sset.hour <= 21


# (lonlat of the three reference example regions, IANA zone, DST offset,
# standard offset) — the zone resolution the reference gets from
# timezonefinder; offsets are what astral would fold into its local times
_REGIONS = [
    ((-121.98, 37.56), 'America/Los_Angeles', -7., -8.),   # Altamont CA
    ((-79.7, 39.), 'America/New_York', -4., -5.),          # Appalachian
    ((-106.21, 42.78), 'America/Denver', -6., -7.),        # WY "jem"
]


@pytest.mark.parametrize('lonlat,zone,dst_off,std_off', _REGIONS)
def test_example_region_timezones(lonlat, zone, dst_off, std_off):
    lon, lat = lonlat
    assert conus_timezone_name(lon, lat) == zone
    assert utc_offset_hours(lon, lat, date(2010, 7, 1)) == dst_off
    assert utc_offset_hours(lon, lat, date(2010, 1, 15)) == std_off


@pytest.mark.parametrize('lonlat,srise_ref,sset_ref', [
    # NOAA-table local times, summer solstice 2010 (DST in effect)
    ((-121.98, 37.56), (5, 46), (20, 33)),
    ((-79.7, 39.), (5, 52), (20, 48)),
    ((-106.21, 42.78), (5, 25), (20, 47)),
])
def test_example_region_sunrise_within_15min(lonlat, srise_ref, sset_ref):
    """Sunrise/sunset pinned within +-15 min of NOAA-table local times for
    every reference example region (the VERDICT r2 acceptance bar for the
    timezone approximation)."""
    srise, sset = get_sunrise_sunset_time(lonlat, date(2010, 6, 21))

    def mins(t):
        return t.hour * 60 + t.minute
    assert abs(mins(srise) - (srise_ref[0] * 60 + srise_ref[1])) <= 15
    assert abs(mins(sset) - (sset_ref[0] * 60 + sset_ref[1])) <= 15


def test_tz_arizona_no_dst():
    assert conus_timezone_name(-112.07, 33.45) == 'America/Phoenix'
    assert utc_offset_hours(-112.07, 33.45, date(2010, 7, 1)) == -7.
    assert utc_offset_hours(-112.07, 33.45, date(2010, 1, 1)) == -7.


def test_tz_outside_conus_falls_back_to_solar():
    # mid-Atlantic: no CONUS zone, lon/15 rule
    assert conus_timezone_name(-40., 45.) is None
    assert utc_offset_hours(-40., 45., date(2010, 7, 1)) == -3.


def test_sunrise_sunset_winter_shorter_day():
    srise_s, sset_s = get_sunrise_sunset_time((-106.21, 42.78),
                                              date(2012, 6, 20))
    srise_w, sset_w = get_sunrise_sunset_time((-106.21, 42.78),
                                              date(2012, 12, 20))
    day_summer = sset_s.hour - srise_s.hour
    day_winter = sset_w.hour - srise_w.hour
    assert day_summer - day_winter >= 4


def test_sunrise_sunset_invalid_date():
    with pytest.raises(ValueError):
        get_sunrise_sunset_time((-106.21, 42.78), 'not-a-date')


def test_seasonal_datetimes_seeded_and_unique():
    rng = np.random.default_rng(5)
    dts = get_seasonal_datetimes_list(
        [2010, 2012], (3, 20), (5, 15), 'daytime', 12,
        (-106.21, 42.78), rng)
    assert len(dts) == len(set(dts)) == 12
    for dt in dts:
        assert dt.year in (2010, 2012)
        assert datetime(dt.year, 3, 20) <= dt <= datetime(dt.year, 5, 16)
        assert 5 <= dt.hour <= 21  # daytime hours
    # seeded determinism
    dts2 = get_seasonal_datetimes_list(
        [2010, 2012], (3, 20), (5, 15), 'daytime', 12,
        (-106.21, 42.78), np.random.default_rng(5))
    assert sorted(dts) == sorted(dts2)


@pytest.mark.parametrize('tod,lo,hi', [('morning', 5, 12),
                                       ('afternoon', 10, 17),
                                       ('evening', 14, 21)])
def test_seasonal_timeofday_windows(tod, lo, hi):
    rng = np.random.default_rng(1)
    dts = get_seasonal_datetimes_list(
        [2012], (6, 1), (6, 30), tod, 8, (-106.21, 42.78), rng)
    for dt in dts:
        assert lo <= dt.hour <= hi, f'{tod}: {dt}'


def test_seasonal_invalid_timeofday():
    with pytest.raises(ValueError):
        get_seasonal_datetimes_list(
            [2012], (6, 1), (6, 30), 'midnight', 2,
            (-106.21, 42.78), np.random.default_rng(0))


def test_seasonal_mode_end_to_end(tmp_path, monkeypatch):
    """Full seasonal run: 3 sampled WTK cases, thermals, multi-case
    summary presence."""
    import h5py
    from ssrs_tpu import Config
    from ssrs_tpu.simulator import Simulator
    import ssrs_tpu.data as data_mod
    from ssrs_tpu.data import WTK as RealWTK

    # build a small WTK fixture for 2012
    year = 2012
    fpath = str(tmp_path / f'wtk_{year}.h5')
    rng = np.random.default_rng(3)
    lats = np.linspace(42.0, 43.8, 90)
    lons = np.linspace(-107.0, -105.0, 60)
    lat_g, lon_g = np.meshgrid(lats, lons, indexing='ij')
    coords = np.stack([lat_g.ravel(), lon_g.ravel()], axis=1)
    layers = ['windspeed_100m', 'winddirection_100m', 'pressure_100m',
              'temperature_100m', 'boundary_layer_height',
              'surface_heat_flux']
    with h5py.File(fpath, 'w') as f:
        f.create_dataset('coordinates', data=coords)
        for name in layers:
            vals = rng.uniform(1, 300, (24 * 366, coords.shape[0]))
            ds = f.create_dataset(name, data=(vals * 10).astype('i4'))
            ds.attrs['scale_factor'] = 10.0

    template = fpath.replace(str(year), '$YEAR')

    class LocalWTK(RealWTK):
        def __init__(self, source_name, lonlat_bounds, varnames, out_dir,
                     **kw):
            super().__init__('LOCAL', lonlat_bounds, varnames, out_dir,
                             local_template=template, local_years=[year])

    monkeypatch.setattr(data_mod, 'WTK', LocalWTK)

    cfg = Config(
        run_name='seas_test', out_dir=str(tmp_path), sim_mode='seasonal',
        sim_seed=8, seasonal_count=3, seasonal_start=(4, 1),
        seasonal_end=(5, 30), seasonal_timeofday='daytime',
        southwest_lonlat=(-106.21, 42.78), region_width_km=(8., 6.),
        resolution=200., track_count=80,
        track_start_region=(1., 7., 1., 2.), track_max_steps=120,
        movement_model='drw', thermals_realization_count=2)
    sim = Simulator(cfg)
    assert len(sim.case_ids) == 3
    # thermals saved per case/realization
    for case in sim.case_ids:
        for r in range(2):
            assert os.path.isfile(os.path.join(
                sim.mode_data_dir, f'{case}_r{r}_thermals.npy'))
        # orograph + 2 thermal realizations -> 3 updraft fields
        assert len(sim.load_updrafts(case)) == 3
    sim.simulate_tracks()
    summary = sim.compute_presence_map(radius=600.)
    assert np.isclose(summary.max(), 1.0)
    assert os.path.isfile(os.path.join(sim.mode_data_dir,
                                       'summary_presence.npy'))

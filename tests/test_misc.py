"""Misc unit tests: Grid geometry, PhaseTimer, pretty_str, windplant
presence plotting with turbine fixtures."""

import os

import numpy as np
import pandas as pd
import pytest

from ssrs_tpu.core import Grid, PhaseTimer, case_key, root_key
from ssrs_tpu.utils import get_extent_from_bounds, pretty_str


def test_grid_from_region():
    g = Grid.from_region((60., 50.), 100., (1000., 2000.))
    assert g.shape == (500, 600)
    assert g.bounds == (1000., 2000., 1000. + 599 * 100., 2000. + 499 * 100.)
    assert g.extent == (1000., 1000. + 599 * 100., 2000., 2000. + 499 * 100.)
    x, y = g.xy_grid()
    assert len(x) == 600 and len(y) == 500
    assert g.burnin_length() == 50
    assert g.reference_max_moves() == 75000


def test_grid_odd_max_moves():
    g = Grid.from_region((6.1, 5.1), 100.)
    # ceil of fractional (nrow/2)*(ncol/2), like the while-loop admits
    assert g.reference_max_moves() == int(np.ceil(
        g.nrow / 2 * g.ncol / 2))


def test_extent_options():
    ext = get_extent_from_bounds((10., 20., 110., 220.), from_origin=True)
    assert ext == (0., 100., 0., 200.)
    ext_km = get_extent_from_bounds((0., 0., 1000., 2000.), in_km=True)
    assert list(ext_km) == [0., 1., 0., 2.]


def test_phase_timer():
    t = PhaseTimer()
    with t.phase('alpha', grid=(4, 5)):
        sum(range(1000))
    with t.phase('beta'):
        pass
    assert [r['phase'] for r in t.records] == ['alpha', 'beta']
    assert t.records[0]['grid'] == (4, 5)
    assert 'alpha' in t.summary()


def test_rng_keys_distinct():
    k1 = case_key(3, 'caseA', 0, 'tracks')
    k2 = case_key(3, 'caseA', 1, 'tracks')
    k3 = case_key(3, 'caseA', 0, 'thermals')
    k4 = case_key(4, 'caseA', 0, 'tracks')
    import jax
    vals = {tuple(np.asarray(jax.random.key_data(k)).ravel())
            for k in (k1, k2, k3, k4)}
    assert len(vals) == 4
    # negative seeds map to a fixed stream (reference 'unseeded' mode)
    a = root_key(-1)
    b = root_key(-5)
    assert (np.asarray(jax.random.key_data(a)) ==
            np.asarray(jax.random.key_data(b))).all()


def test_pretty_str():
    out = pretty_str('x', np.array([[1], [2], [3]]))
    assert out.startswith('x = ') and out.endswith('.T')
    out2 = pretty_str('cov', np.eye(2))
    assert '\n' in out2


def test_windplant_presence_map(tmp_path, monkeypatch):
    """plot_windplant_presence_map with an injected turbine fixture."""
    from ssrs_tpu import Config
    from ssrs_tpu.simulator import Simulator
    import ssrs_tpu.simulator as sim_mod
    from ssrs_tpu.data import TurbinesUSWTB as RealTB

    fixture = pd.DataFrame({
        't_state': ['WY'] * 3,
        'p_name': ['Demo Plant'] * 3,
        'p_year': [2015] * 3,
        't_cap': [2000] * 3,
        't_hh': [90.] * 3,
        't_rd': [100.] * 3,
        'xlong': [-106.18, -106.17, -106.16],
        'ylat': [42.80, 42.805, 42.81],
    })

    class FixtureTB(RealTB):
        def __init__(self, bounds, crs_string='EPSG:4326',
                     min_hubheight=50., out_fpath=None,
                     print_verbose=False):
            super().__init__(bounds, crs_string, min_hubheight,
                             out_fpath=None, print_verbose=print_verbose,
                             dataframe=fixture.copy())

    monkeypatch.setattr(sim_mod, 'TurbinesUSWTB', FixtureTB)

    cfg = Config(
        run_name='wp_test', out_dir=str(tmp_path), sim_mode='uniform',
        sim_seed=6, southwest_lonlat=(-106.21, 42.78),
        region_width_km=(8., 6.), resolution=200., track_count=100,
        track_start_region=(1., 7., 1., 2.), track_max_steps=150,
        movement_model='drw')
    sim = Simulator(cfg)
    assert sim.turbines.dframe is not None
    assert list(sim.turbines.get_project_names()) == ['Demo Plant']
    sim.simulate_tracks()
    sim.plot_windplant_presence_map('Demo Plant', plot_turbs=True)
    assert os.path.isfile(os.path.join(sim.mode_fig_dir,
                                       'presence_Demo Plant.png'))

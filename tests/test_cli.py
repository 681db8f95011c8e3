"""python -m ssrs_tpu CLI (ssrs_tpu/__main__.py)."""

import json

import pytest

from ssrs_tpu.__main__ import main


def test_info_runs(capsys):
    assert main(['info']) == 0
    out = capsys.readouterr().out
    assert 'jax' in out and 'backend' in out


def test_run_rejects_unknown_fields(tmp_path):
    cfg = tmp_path / 'bad.json'
    cfg.write_text(json.dumps({'run_name': 'x', 'not_a_field': 1}))
    with pytest.raises(SystemExit, match='not_a_field'):
        main(['run', str(cfg)])


def test_run_tiny_synthetic(tmp_path):
    """Full CLI run on a tiny offline config: artifacts + figures."""
    cfg = tmp_path / 'tiny.json'
    cfg.write_text(json.dumps({
        'run_name': 'cli_tiny',
        'out_dir': str(tmp_path / 'out'),
        'sim_mode': 'uniform',
        'southwest_lonlat': [-106.21, 42.78],
        'region_width_km': [4., 3.],
        'resolution': 100.,
        'uniform_winddirn': 270.,
        'uniform_windspeed': 10.,
        'track_direction': 0.,
        'track_count': 50,
        'track_start_region': [1., 3., 0.5, 1.],
    }))
    assert main(['run', str(cfg)]) == 0
    run_dir = tmp_path / 'out' / 'cli_tiny'
    data = run_dir / 'data' / 'uniform'
    assert any(p.suffix == '.npy' for p in data.iterdir())
    figs = run_dir / 'figs'
    assert any(figs.rglob('*.png'))


def test_run_engine_knobs_from_json(tmp_path):
    """The engine knobs are reachable from a run JSON (VERDICT r3 item
    4): track_pkl_budget=0 suppresses trajectory materialization even
    for a tiny run, and step/presence/tail knobs flow into the engine
    without error."""
    cfg = tmp_path / 'knobs.json'
    cfg.write_text(json.dumps({
        'run_name': 'cli_knobs',
        'out_dir': str(tmp_path / 'out'),
        'sim_mode': 'uniform',
        'region_width_km': [4., 3.],
        'resolution': 100.,
        'track_count': 50,
        'track_start_region': [1., 3., 0.5, 1.],
        'track_max_steps': 120,
        'track_pkl_budget': 0,
        'track_step_impl': 'xla',
        'track_presence_impl': 'scatter',
        'track_tail_bucket': 'auto',
    }))
    assert main(['run', str(cfg), '--no-plots']) == 0
    data = tmp_path / 'out' / 'cli_knobs' / 'data' / 'uniform'
    assert not list(data.glob('*_tracks.pkl'))   # budget 0: no pkl
    assert list(data.glob('*_counts.npy'))       # counts still written

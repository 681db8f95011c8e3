"""Interleaved A/B: Config.fields_device (device-resident multi-case
prep fields) vs the host-materialized flow, through the production
``simulate_direction_sweep`` path.

What fields_device changes (round 5, docs/DESIGN.md "Round 5: the
Appalachian end-to-end"): the thresholded conductivities and solved
potentials never round-trip the axon tunnel — host island labeling
reads a packed cond>0 bitmask (N/8 bytes instead of 4N) and the
batched weight-table build consumes the solver's device outputs
directly. The host flow pays ~160 MB conductivity pull + ~160 MB
potential re-upload at the 24-case 1200x1400 Appalachian shape.

Interleaved (A, B, A, B, ...) within one process/window because the
tunneled chip's throughput swings 2-3x between hours-scale windows.

Env: AB_GRID (default 1200x1400), AB_DIRNS (24), AB_TRACKS (1000),
AB_REPS (3, per arm, after one untimed warm rep per arm).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from ssrs_tpu.simulator import Simulator, _enable_compile_cache

    _enable_compile_cache()
    grid = os.environ.get('AB_GRID', '1200x1400')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_dirns = int(os.environ.get('AB_DIRNS', 24))
    n_tracks = int(os.environ.get('AB_TRACKS', 1000))
    reps = int(os.environ.get('AB_REPS', 3))
    dirns = [float(d) for d in np.linspace(180., 320., n_dirns)]
    res = 50. if max(nrow, ncol) >= 1000 else 100.

    out_dir = '/tmp/devfields_ab_out'
    shutil.rmtree(out_dir, ignore_errors=True)
    sims = {}
    for name, dev in (('host', False), ('dev', True)):
        sims[name] = Simulator(
            run_name=f'ab_{name}', out_dir=out_dir, sim_mode='uniform',
            sim_seed=1, southwest_lonlat=(-106.21, 42.78),
            region_width_km=(ncol * res / 1000., nrow * res / 1000.),
            resolution=res, uniform_winddirn=270., uniform_windspeed=10.,
            track_direction=0., track_count=n_tracks,
            track_start_region=(1., ncol * res / 1000. - 1., 1., 2.),
            movement_model='fluidflow', fields_device=dev)

    def run(sim):
        shutil.rmtree(sim.mode_data_dir, ignore_errors=True)
        os.makedirs(sim.mode_data_dir, exist_ok=True)
        sim.timer.records.clear()
        t0 = time.perf_counter()
        cases = sim.simulate_direction_sweep(dirns)
        wall = time.perf_counter() - t0
        assert len(cases) == n_dirns
        engine = sum(float(r.get('seconds', 0.))
                     for r in sim.timer.records
                     if r.get('phase') == 'batched_tracks')
        return wall, engine

    walls = {'host': [], 'dev': []}
    engines = {'host': [], 'dev': []}
    for rep in range(reps + 1):
        for name in ('host', 'dev'):
            wall, engine = run(sims[name])
            tag = 'warm-up' if rep == 0 else f'rep {rep}'
            print(f'[{tag}] {name}: wall={wall:.2f}s '
                  f'(engine {engine:.2f}s, prep {wall - engine:.2f}s)',
                  flush=True)
            if rep > 0:
                walls[name].append(wall)
                engines[name].append(engine)

    out = {
        'bench': 'device_fields_ab', 'grid': grid, 'cases': n_dirns,
        'tracks_per_case': n_tracks,
        'host_wall_s': [round(w, 2) for w in walls['host']],
        'dev_wall_s': [round(w, 2) for w in walls['dev']],
        'host_prep_s': [round(w - e, 2) for w, e in
                        zip(walls['host'], engines['host'])],
        'dev_prep_s': [round(w - e, 2) for w, e in
                       zip(walls['dev'], engines['dev'])],
        'speedup_wall': round(min(walls['host']) / min(walls['dev']), 3),
        'speedup_prep': round(
            min(w - e for w, e in zip(walls['host'], engines['host'])) /
            min(w - e for w, e in zip(walls['dev'], engines['dev'])), 3),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()

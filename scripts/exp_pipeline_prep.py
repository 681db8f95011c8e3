"""Pipelined multi-case potential prep A/B (round 4).

The Simulator's per-case fields prep used to serialize host work
(island labeling + tile build, ~0.3-0.5 s/case) with the device solve
and its residual read. begin/finish_directional_potential now overlap
them with a bounded pipeline. This measures serial (finish right after
begin, depth 1) vs pipelined (depth 3) prep over C distinct
wind-snapshot-like conductivity fields at the WY bench scale,
interleaved to dodge device-window swings.

Env: PP_CASES (default 8), PP_GRID (default 500x600), PP_REPS (3).
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import synthetic_dem
    import jax.numpy as jnp
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.simulator import Simulator, _enable_compile_cache

    _enable_compile_cache()
    grid = os.environ.get('PP_GRID', '500x600')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_cases = int(os.environ.get('PP_CASES', 8))
    reps = int(os.environ.get('PP_REPS', 3))

    out_dir = '/tmp/pp_prep_out'
    shutil.rmtree(out_dir, ignore_errors=True)
    sim = Simulator(
        run_name='pp', out_dir=out_dir, sim_mode='uniform', sim_seed=1,
        southwest_lonlat=(-106.21, 42.78),
        region_width_km=(ncol * 0.1, nrow * 0.1), resolution=100.,
        uniform_winddirn=270., uniform_windspeed=10.,
        track_direction=0., track_count=100,
        track_start_region=(1., 11., 1., 2.),
        movement_model='fluidflow')
    dem = synthetic_dem(nrow, ncol, 100.)
    updrafts = []
    for i in range(n_cases):
        rng = np.random.default_rng(i)
        s = (8. + 4. * rng.random((nrow, ncol))).astype(np.float32)
        d = (200. + 140. * rng.random((nrow, ncol))).astype(np.float32)
        w = orographic_updraft_from_dem(jnp.asarray(dem), 100.,
                                        jnp.asarray(s), jnp.asarray(d))
        updrafts.append(np.asarray(get_above_threshold_speed(w, 0.75)))

    def clean():
        shutil.rmtree(sim.mode_data_dir, ignore_errors=True)
        os.makedirs(sim.mode_data_dir, exist_ok=True)

    def run(depth: int) -> float:
        clean()
        t0 = time.perf_counter()
        pending = []
        outs = []
        for i, u in enumerate(updrafts):
            pending.append(sim.begin_directional_potential(
                u, f'c{i}', 0))
            if len(pending) >= depth:
                outs.append(sim.finish_directional_potential(
                    pending.pop(0)))
        while pending:
            outs.append(sim.finish_directional_potential(pending.pop(0)))
        dt = time.perf_counter() - t0
        assert len(outs) == n_cases
        return dt

    # warm compiles for every island-bucket this field set hits
    run(1)
    for r in range(reps):
        a = run(1)
        b = run(3)
        print(f'rep {r}: serial {a:.2f}s  pipelined {b:.2f}s  '
              f'speedup {a / b:.2f}x', flush=True)


if __name__ == '__main__':
    main()

"""Production multi-case potential-prep A/B: Simulator._prepare_potentials
with Config.potential_batch=1 (round-4 pipelined per-case dispatch) vs
0 (auto batched vmapped groups). This is the END-TO-END prep wall the
seasonal/sweep paths actually pay (cache checks + host labeling +
device solves + artifact saves), unlike exp_batch_solve_probe.py which
times the solver layers in isolation.

Interleaved reps (A, B, A, B, ...) to dodge device-window swings.

Env: PE_CASES (default 8), PE_GRID (default 500x600), PE_REPS (3).
  The Appalachian-scale check is PE_GRID=1200x1400 PE_CASES=24.
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
    grid = os.environ.get('PE_GRID', '500x600')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_cases = int(os.environ.get('PE_CASES', 8))
    reps = int(os.environ.get('PE_REPS', 3))

    out_dir = '/tmp/pe_prep_out'
    shutil.rmtree(out_dir, ignore_errors=True)
    sim = Simulator(
        run_name='pe', out_dir=out_dir, sim_mode='uniform', sim_seed=1,
        southwest_lonlat=(-106.21, 42.78),
        region_width_km=(ncol * 0.1, nrow * 0.1), resolution=100.,
        uniform_winddirn=270., uniform_windspeed=10.,
        track_direction=0., track_count=100,
        track_start_region=(1., 11., 1., 2.),
        movement_model='fluidflow')
    dem = synthetic_dem(nrow, ncol, 100.)
    items = []
    for i in range(n_cases):
        rng = np.random.default_rng(i)
        s = (8. + 4. * rng.random((nrow, ncol))).astype(np.float32)
        d = (200. + 140. * rng.random((nrow, ncol))).astype(np.float32)
        w = orographic_updraft_from_dem(jnp.asarray(dem), 100.,
                                        jnp.asarray(s), jnp.asarray(d))
        items.append((f'c{i}', 0,
                      np.asarray(get_above_threshold_speed(w, 0.75))))

    def clean():
        shutil.rmtree(sim.mode_data_dir, ignore_errors=True)
        os.makedirs(sim.mode_data_dir, exist_ok=True)

    def run(batch: int) -> float:
        sim.potential_batch = batch
        clean()
        t0 = time.perf_counter()
        pots = sim._prepare_potentials(items)
        dt = time.perf_counter() - t0
        assert len(pots) == n_cases
        return dt

    # warm every executable both arms touch
    run(1)
    run(0)
    print(f'cases={n_cases} grid={nrow}x{ncol} '
          f'auto_cap={sim._potential_batch_cap()}', flush=True)
    a_all, b_all = [], []
    for r in range(reps):
        a = run(1)   # pipelined per-case dispatch
        b = run(0)   # auto batched vmapped groups
        a_all.append(a)
        b_all.append(b)
        print(f'rep {r}: pipelined {a:.2f}s  batched {b:.2f}s  '
              f'speedup {a / b:.2f}x', flush=True)
    print(f'min: pipelined {min(a_all):.2f}s  batched {min(b_all):.2f}s  '
          f'speedup {min(a_all) / min(b_all):.2f}x')


if __name__ == '__main__':
    main()

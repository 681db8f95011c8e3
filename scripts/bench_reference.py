"""Measure the REFERENCE implementation's track-generation throughput
on THIS machine, for an apples-to-apples denominator.

BASELINE.md's 4e4 agent-steps/s comes from the authors' committed laptop
notebook timings (workshop/ssrs_demo.ipynb:445). This script runs the
actual reference walker (ssrs/movmodel.py::generate_simulated_tracks,
imported from /root/reference — not copied) on the same 500x600
bench workload shape this repo's bench.py uses, on local CPU, and
prints measured steps/s for one core and the pool-extrapolated number.

Usage: python scripts/bench_reference.py [n_tracks]
"""

import importlib.util
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

REF_MOVMODEL = '/root/reference/ssrs/movmodel.py'


def load_ref():
    spec = importlib.util.spec_from_file_location(
        'ref_movmodel', REF_MOVMODEL)
    mod = importlib.util.module_from_spec(spec)
    had = hasattr(np, 'int')
    if not had:
        np.int = int   # the reference predates numpy 1.24
    try:
        spec.loader.exec_module(mod)
    finally:
        if not had:
            del np.int
    return mod


def main():
    if not os.path.exists(REF_MOVMODEL):
        print('reference checkout not available; nothing to measure')
        return
    n_tracks = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    ref = load_ref()

    from bench import synthetic_dem
    from ssrs_tpu.agents.starts import get_starting_indices
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential.direct import solve_potential_direct
    import jax.numpy as jnp

    nrow, ncol, res = 500, 600, 100.0
    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
    speeds = 10. * jnp.ones((nrow, ncol), jnp.float32)
    w = orographic_updraft_from_dem(dem, res, speeds,
                                    270. * jnp.ones_like(speeds))
    updraft = np.asarray(get_above_threshold_speed(w, 0.75), np.float32)
    t0 = time.perf_counter()
    potential = np.asarray(solve_potential_direct(updraft, 0.),
                           np.float32)
    print(f'# potential via f64 spsolve: {time.perf_counter()-t0:.1f} s')

    rows, cols = get_starting_indices(
        n_tracks, [5., 55., 1., 2.], 'random',
        (ncol * res / 1000., nrow * res / 1000.), res,
        rng=np.random.default_rng(42))
    starts = np.stack([rows, cols], axis=1)

    np.random.seed(0)
    total_steps = 0
    t0 = time.perf_counter()
    for s in starts.tolist():
        track = ref.generate_simulated_tracks(
            0., list(s), (nrow, ncol), memory_parameter=1,
            scaling_parameter=1., updraft_field=updraft,
            potential_field=potential)
        total_steps += len(track) - 1
    dt = time.perf_counter() - t0
    per_core = total_steps / dt
    ncores = os.cpu_count() or 1
    print(f'reference walker: {n_tracks} tracks, {total_steps} steps '
          f'in {dt:.1f} s')
    print(f'  {per_core:,.0f} agent-steps/s on ONE core of this machine')
    print(f'  x{ncores} cores (perfect pool scaling upper bound): '
          f'{per_core * ncores:,.0f} agent-steps/s')
    print(f'  BASELINE.md denominator (laptop pool, committed '
          f'notebooks): 40,000 agent-steps/s')


if __name__ == '__main__':
    main()

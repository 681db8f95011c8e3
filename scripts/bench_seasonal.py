"""Seasonal-ensemble benchmark (BASELINE.json config 4 analog, offline):
many wind-field cases x 1000 tracks on an Appalachian-scale grid
(1200x1400 @50 m), A/B-ing the two multi-case engines:

- 'vmapped': the jitted lockstep engine (simulate_presence_cases) —
  XLA step, no compaction, all cases run until the last one dies;
- 'compacting': the round-3→4 production path
  (simulate_presence_cases_compacting) — fused Pallas step on TPU,
  per-case dead-agent compaction + one-dispatch tail, host scalar
  reads overlapped across cases.

Round-3 measured (v5e, 24 cases, vmapped): all 24 simulations in
~4.9 s (32.5M agent-steps with the reference-exact potential).
Potential fields go through the production refined solver; warm
per-case prep is ~1.8 s (updraft 0.3 + labels 0.1 + tile hierarchy 0.4
+ device solve 1.0), with one-time XLA compiles per (shape,
island-bucket) combination on top of the first run."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import synthetic_dem
    from ssrs_tpu.agents import (TrackParams, directional_probs,
                                 get_starting_indices, prepared_weights,
                                 simulate_presence_cases,
                                 simulate_presence_cases_compacting)
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks

    # defaults reproduce the round-3 Appalachian workload; the WY-scale
    # fused-eligible seasonal run (grid fits the fused kernel's VMEM
    # histogram) is SSRS_SEASONAL_GRID=500x600 SSRS_SEASONAL_TRACKS=100000
    grid_env = os.environ.get('SSRS_SEASONAL_GRID', '1200x1400')
    nrow, ncol = (int(v) for v in grid_env.split('x'))
    res = 50.0
    n_cases = int(os.environ.get('SSRS_SEASONAL_CASES', 24))
    n_tracks = int(os.environ.get('SSRS_SEASONAL_TRACKS', 1000))
    step_cap = int(os.environ.get('SSRS_SEASONAL_CAP', 4000))

    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
    dirp = jnp.asarray(directional_probs(0.))
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=step_cap)

    # one wind case per sampled direction/speed (the seasonal analog)
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    tables = []
    for i in range(n_cases):
        dirn = float(rng.uniform(180., 360.))
        speed = float(rng.uniform(6., 14.))
        w = orographic_updraft_from_dem(
            dem, res, speed * jnp.ones((nrow, ncol), jnp.float32),
            dirn * jnp.ones((nrow, ncol), jnp.float32))
        cond = get_above_threshold_speed(w, 0.75)
        bmask, bvals = boundary_masks(0., (nrow, ncol))
        pot, _ = solve_potential_refined(np.asarray(cond), bmask, bvals)
        tables.append(prepared_weights(cond, jnp.asarray(pot), dirp,
                                       'bfloat16'))
    tables = jnp.stack(tables)
    tables.block_until_ready()
    dt_fields = time.perf_counter() - t0

    rows, cols = get_starting_indices(
        n_tracks, [2., ncol * res / 1000. - 2., 1., 2.], 'random',
        (ncol * res / 1000., nrow * res / 1000.), res,
        rng=np.random.default_rng(2))
    starts = jnp.asarray(np.stack([rows, cols], 1), jnp.int32)
    keys = jax.random.split(jax.random.key(0), n_cases)
    dirps = jnp.broadcast_to(dirp, (n_cases, 9))

    def run_vmapped(seed):
        ks = jax.random.split(jax.random.key(seed), n_cases)
        p, s = simulate_presence_cases(params, tables, dirps, starts,
                                       ks, chunk=512)
        return np.asarray(p)  # materialization = reliable axon sync

    def run_compacting(seed):
        ks = list(jax.random.split(jax.random.key(seed), n_cases))
        p, s = simulate_presence_cases_compacting(
            params, list(tables), starts, ks, dirps=dirps, chunk=512,
            tail_bucket='auto')
        return np.asarray(p)

    results = {}
    for name, runner in (('vmapped', run_vmapped),
                         ('compacting', run_compacting)):
        runner(0)  # compile + first run
        runner(0)  # warm caches / auto-tail estimates
        t0 = time.perf_counter()
        p = runner(1)
        dt = time.perf_counter() - t0
        total = int(p.astype(np.int64).sum())
        results[name] = {
            'sim_seconds': round(dt, 2),
            'agent_steps': total - n_cases * n_tracks,
            'steps_per_sec': round((total - n_cases * n_tracks) / dt, 1),
        }

    print(json.dumps({
        'metric': 'seasonal_ensemble',
        'grid': [nrow, ncol],
        'cases': n_cases,
        'tracks_per_case': n_tracks,
        'fields_seconds': round(dt_fields, 2),
        'engines': results,
        'speedup_compacting_vs_vmapped': round(
            results['vmapped']['sim_seconds']
            / max(results['compacting']['sim_seconds'], 1e-9), 2),
    }))


if __name__ == '__main__':
    main()

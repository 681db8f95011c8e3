"""Seasonal-ensemble benchmark (BASELINE.json config 4 analog, offline):
many wind-field cases x 1000 tracks on an Appalachian-scale grid
(1200x1400 @50 m), all cases advancing together via the batched engine.

Measured (v5e, 24 cases): all 24 simulations complete in ~4.9 s
(32.5M agent-steps with the reference-exact potential — tracks reach
the boundary sooner than under the legacy row-normalized solve).
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
                                 simulate_presence_cases)
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks

    nrow, ncol, res = 1200, 1400, 50.0
    n_cases = int(os.environ.get('SSRS_SEASONAL_CASES', 24))
    n_tracks = 1000
    step_cap = 4000

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

    presence, steps = simulate_presence_cases(params, tables, dirps,
                                              starts, keys, chunk=512)
    presence.block_until_ready()  # compile + run
    t0 = time.perf_counter()
    keys2 = jax.random.split(jax.random.key(1), n_cases)
    presence, steps = simulate_presence_cases(params, tables, dirps,
                                              starts, keys2, chunk=512)
    presence.block_until_ready()
    dt_sim = time.perf_counter() - t0
    total = int(np.asarray(presence).astype(np.int64).sum())

    print(json.dumps({
        'metric': 'seasonal_ensemble',
        'grid': [nrow, ncol],
        'cases': n_cases,
        'tracks_per_case': n_tracks,
        'fields_seconds': round(dt_fields, 2),
        'sim_seconds': round(dt_sim, 2),
        'agent_steps': total - n_cases * n_tracks,
        'steps_per_sec': round((total - n_cases * n_tracks) / dt_sim, 1),
    }))


if __name__ == '__main__':
    main()

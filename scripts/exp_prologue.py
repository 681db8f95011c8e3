"""Where do the non-chunk ~0.2-0.3 s per warm bench run go?

Breaks a warm simulate_presence_compacting call into its host prologue
(eager prepared_weights / init_state dispatches, numpy table builds,
start padding) vs the chunk loop, on the real TPU with the bench
workload. Timings via np.asarray materialization (axon-safe).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.simulator import _enable_compile_cache

_enable_compile_cache()

from bench import synthetic_dem  # the bench terrain
from ssrs_tpu.agents.moves import directional_probs, restriction_table
from ssrs_tpu.agents.simulate import (TrackParams, _pad_starts, init_state,
                                      prepared_weights,
                                      simulate_presence_compacting)
from ssrs_tpu.fields import (get_above_threshold_speed,
                             orographic_updraft_from_dem)
from ssrs_tpu.potential import solve_potential_refined
from ssrs_tpu.potential.boundary import boundary_masks


def main():
    nrow, ncol, res = 500, 600, 100.0
    n_tracks = 100_000
    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
    speeds = 10. * jnp.ones((nrow, ncol), jnp.float32)
    w = orographic_updraft_from_dem(dem, res, speeds,
                                    270. * jnp.ones_like(speeds))
    conductivity = get_above_threshold_speed(w, 0.75)
    bmask, bvals = boundary_masks(0., (nrow, ncol))
    pot, _ = solve_potential_refined(np.asarray(conductivity), bmask,
                                     bvals)
    pot = jnp.asarray(np.asarray(pot))
    rng = np.random.default_rng(7)
    rows = rng.integers(5, nrow - 5, n_tracks)
    cols = rng.integers(5, ncol - 5, n_tracks)
    starts = np.stack([rows, cols], axis=1).astype(np.int32)
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=10_000)

    def full_run(key):
        presence, steps = simulate_presence_compacting(
            params, starts, key, updraft=conductivity, potential=pot,
            chunk=512)
        return int(np.asarray(jnp.sum(presence)))

    full_run(jax.random.key(0))  # warm compiles

    # phase: tables (host numpy)
    t = time.perf_counter()
    for i in range(6):
        dirp = jnp.asarray(directional_probs(params.move_dirn))
        table = jnp.asarray(restriction_table())
    np.asarray(table)
    dt_tables = (time.perf_counter() - t) / 6

    # phase: prepared_weights (eager jnp ops)
    t = time.perf_counter()
    for i in range(6):
        base_flat = prepared_weights(conductivity, pot, dirp,
                                     params.weight_dtype)
    np.asarray(base_flat[0])
    dt_weights = (time.perf_counter() - t) / 6

    # phase: start padding + init_state
    t = time.perf_counter()
    for i in range(6):
        starts_p, valid = _pad_starts(params, starts, None, True)
        state = init_state(params, starts_p, jax.random.key(i),
                           valid=valid)
    np.asarray(state.pos_r[0])
    dt_init = (time.perf_counter() - t) / 6

    # full runs for reference
    t = time.perf_counter()
    for i in range(1, 7):
        full_run(jax.random.key(i))
    dt_full = (time.perf_counter() - t) / 6

    print(f'tables      {dt_tables * 1e3:7.1f} ms')
    print(f'weights     {dt_weights * 1e3:7.1f} ms')
    print(f'pad+init    {dt_init * 1e3:7.1f} ms')
    print(f'full run    {dt_full * 1e3:7.1f} ms')


if __name__ == '__main__':
    main()

"""Re-measure the tail-switch threshold on the current bench workload.

Pre-sync-discipline, switching to the one-dispatch tail at a 12k bucket
measured WORSE than chunking down the ladder (dead-slot work beat saved
RTTs). Two things changed since: the corrected-potential workload decays
much faster (survivors at the 12k bucket die within one 512-chunk), and
the chunked path now costs exactly one RTT per chunk. Re-measure
tail_bucket in {min_bucket (default), 4x, 8x, 16x, 32x min_bucket} with
the bench clock (6 summed runs, device-side reductions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ssrs_tpu.simulator import _enable_compile_cache
    _enable_compile_cache()
    from bench import synthetic_dem
    from ssrs_tpu.agents import (TrackParams, get_starting_indices,
                                 prepare_starts,
                                 simulate_presence_compacting)
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks

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
    rows, cols = get_starting_indices(
        n_tracks, [5., 55., 1., 2.], 'random',
        (ncol * res / 1000., nrow * res / 1000.), res,
        rng=np.random.default_rng(42))
    starts = np.stack([rows, cols], axis=1).astype(np.int32)
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=10_000)
    starts_dev, valid_dev = prepare_starts(params, starts)

    def clock(tail_bucket):
        def run(key):
            presence, steps = simulate_presence_compacting(
                params, starts_dev, key, updraft=conductivity,
                potential=pot, chunk=512, valid=valid_dev,
                tail_bucket=tail_bucket)
            return presence

        int(np.asarray(jnp.sum(run(jax.random.key(0)))))  # warm
        tot = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for i in range(1, 7):
            tot = tot + jnp.sum(run(jax.random.key(i)))
        total = int(np.asarray(tot))
        dt = time.perf_counter() - t0
        useful = total - 6 * n_tracks
        return useful / dt, dt / 6

    # 1024 = deterministic default (switch at min_bucket),
    # 'auto' = opt-in measured rule
    from ssrs_tpu.agents.simulate import _dispatch_overhead
    print(f'measured rtt: {_dispatch_overhead() * 1e3:.1f} ms',
          flush=True)
    for tb in (1024, 'auto', 16384, 'auto', 1024, 16384):
        rate, per_run = clock(tb)
        label = str(tb)
        print(f'tail_bucket={label:>6s}: {rate / 1e6:7.1f}M steps/s '
              f'({per_run * 1e3:.0f} ms/run)', flush=True)


if __name__ == '__main__':
    main()

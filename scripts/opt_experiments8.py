"""Round-2 experiment: chunk-batched Pallas histogram vs in-scan matmul.

Hypothesis (DESIGN.md "Measured step anatomy"): the presence update is
~90% of the lockstep step; the presence-free step measured 131 us vs
1525 us full at 100k agents. Emitting int16 position planes from the scan
(cheap HBM writes) and computing presence with ONE batched Pallas
histogram per chunk should amortize the per-call latency that made the
per-step in-scan Pallas call a wash, without the K-fold HBM one-hot blowup
that made the K-unrolled matmul negative.

Workload = the bench.py north-star (500x600 @100 m, 100k tracks,
10k step cap, compaction) so numbers are directly comparable.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from bench import synthetic_dem
from ssrs_tpu.simulator import _enable_compile_cache

_enable_compile_cache()

from ssrs_tpu.agents import (TrackParams, get_starting_indices,
                             simulate_presence_compacting)
from ssrs_tpu.fields import (get_above_threshold_speed,
                             orographic_updraft_from_dem)
from ssrs_tpu.potential import solve_potential_for_direction

import jax.numpy as jnp

nrow, ncol, res = 500, 600, 100.0
n_tracks = 100_000
step_cap = 10_000

dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
speeds = 10. * jnp.ones((nrow, ncol), jnp.float32)
w = orographic_updraft_from_dem(dem, res, speeds,
                                270. * jnp.ones_like(speeds))
conductivity = get_above_threshold_speed(w, 0.75)
pot, _ = solve_potential_for_direction(conductivity, 0., tol=1e-6,
                                       maxiter=100)
pot.block_until_ready()

rows, cols = get_starting_indices(
    n_tracks, [5., 55., 1., 2.], 'random',
    (ncol * res / 1000., nrow * res / 1000.), res,
    rng=np.random.default_rng(42))
starts = np.stack([rows, cols], axis=1).astype(np.int32)


def run_variant(name, impl, chunk):
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=step_cap, presence_impl=impl)
    presence, steps = simulate_presence_compacting(
        params, starts, jax.random.key(0), updraft=conductivity,
        potential=pot, chunk=chunk)
    presence.block_until_ready()  # compile + run
    t0 = time.perf_counter()
    presence, steps = simulate_presence_compacting(
        params, starts, jax.random.key(1), updraft=conductivity,
        potential=pot, chunk=chunk)
    presence.block_until_ready()
    dt = time.perf_counter() - t0
    useful = int(np.asarray(presence).astype(np.int64).sum()) - n_tracks
    print(f'{name:32s} chunk={chunk:5d} {dt:7.3f} s '
          f'{useful / dt / 1e6:8.1f} M useful steps/s '
          f'(scan steps {int(steps)})', flush=True)
    return useful / dt


def main():
    # Historical note: this experiment's subject — the 'chunk-hist'
    # presence impl — was measured as a loser and PRUNED in round 3
    # (results preserved in docs/DESIGN.md). Only the production
    # baseline remains runnable here; the batch histogram kernel itself
    # lives on in agents/pallas_hist.py.
    print(f'device: {jax.devices()[0]}', flush=True)
    run_variant('auto (in-scan matmul)', 'auto', 1024)
    run_variant('auto (in-scan matmul)', 'auto', 1024)


if __name__ == '__main__':
    main()

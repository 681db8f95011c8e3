"""Round-2 ablation (modernized in round 3): per-step cost of the
PRODUCTION step function (make_step_fn) by presence_impl, at fixed
population (no compaction), on real TPU. Complements the round-1
hand-rolled ablation in ablate_step.py.

Round-3 changes: the pruned 'chunk-hist' variant is gone (its measured
history lives in docs/DESIGN.md); a fused-engine row was added; the
clock materializes an output that depends on every step instead of
block_until_ready (which does not reliably sync on axon — CLAUDE.md).
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

from ssrs_tpu.agents.moves import directional_probs, restriction_table
from ssrs_tpu.agents.simulate import (TrackParams, flush_pending,
                                      init_state, make_step_fn,
                                      prepared_weights)

NROW, NCOL = 500, 600
N = 100_000  # multiple of FUSED_BLK for the fused row
STEPS = 256


def fields():
    y = np.linspace(0, np.pi, NROW)[:, None]
    x = np.linspace(0, 2 * np.pi, NCOL)[None, :]
    updraft = (1.0 + 0.8 * np.sin(3 * x) * np.sin(2 * y)).astype(np.float32)
    potential = (np.linspace(1000., 0., NROW)[:, None]
                 * np.ones((1, NCOL))).astype(np.float32)
    return updraft, potential


def time_variant(name, params, base_flat, dirp, table, starts):
    step_fn = make_step_fn(params, base_flat, dirp, table)
    state = init_state(params, starts, jax.random.key(0))

    @jax.jit
    def run(state):
        state = jax.lax.scan(lambda s, _: (step_fn(s), None), state,
                             None, length=STEPS)[0]
        return flush_pending(params, state)

    out = run(state)
    np.asarray(out.pos_r)  # compile + run (honest sync: depends on all steps)
    t0 = time.perf_counter()
    out = run(out)
    np.asarray(out.pos_r)
    dt = time.perf_counter() - t0
    print(f'{name:24s} {dt / STEPS * 1e6:9.1f} us/step '
          f'{N * STEPS / dt / 1e6:8.1f} M agent-steps/s', flush=True)


def main():
    rng = np.random.default_rng(0)
    updraft, potential = fields()
    dirp = jnp.asarray(directional_probs(0.))
    table = jnp.asarray(restriction_table())
    starts = np.stack([rng.integers(1, NROW - 1, N),
                       rng.integers(1, NCOL - 1, N)], 1).astype(np.int32)

    print(f'device: {jax.devices()[0]}  N={N}  grid={NROW}x{NCOL}',
          flush=True)
    base = dict(grid_shape=(NROW, NCOL), move_dirn=0., nu=1.,
                memory_k=1, burnin=50, nsteps=10_000_000)
    for impl in ('none', 'matmul', 'scatter'):
        params = TrackParams(presence_impl=impl, step_impl='xla', **base)
        base_flat = prepared_weights(updraft, potential, dirp,
                                     params.weight_dtype)
        time_variant(f'xla/{impl}', params, base_flat, dirp, table, starts)
    if jax.devices()[0].platform != 'cpu':
        params = TrackParams(step_impl='fused', **base)
        base_flat = prepared_weights(updraft, potential, dirp,
                                     params.weight_dtype)
        time_variant('fused/lanes', params, base_flat, dirp, table, starts)


if __name__ == '__main__':
    main()

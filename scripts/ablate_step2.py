"""Round-2 ablation: per-step cost of the PRODUCTION step function
(make_step_fn) by presence_impl, at fixed population (no compaction), on
real TPU. Complements the round-1 hand-rolled ablation in ablate_step.py.
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
from ssrs_tpu.agents.simulate import (SimState, TrackParams, init_state,
                                      make_step_fn, prepared_weights,
                                      _run_chunk_hist)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256


def fields():
    y = np.linspace(0, np.pi, NROW)[:, None]
    x = np.linspace(0, 2 * np.pi, NCOL)[None, :]
    updraft = (1.0 + 0.8 * np.sin(3 * x) * np.sin(2 * y)).astype(np.float32)
    potential = (np.linspace(1000., 0., NROW)[:, None]
                 * np.ones((1, NCOL))).astype(np.float32)
    return updraft, potential


def main():
    rng = np.random.default_rng(0)
    updraft, potential = fields()
    dirp = jnp.asarray(directional_probs(0.))
    table = jnp.asarray(restriction_table())
    starts = np.stack([rng.integers(1, NROW - 1, N),
                       rng.integers(1, NCOL - 1, N)], 1).astype(np.int32)

    print(f'device: {jax.devices()[0]}  N={N}  grid={NROW}x{NCOL}',
          flush=True)
    for impl in ('none', 'matmul', 'scatter'):
        params = TrackParams(grid_shape=(NROW, NCOL), move_dirn=0., nu=1.,
                             memory_k=1, burnin=50, nsteps=10_000_000,
                             presence_impl=impl)
        base_flat = prepared_weights(updraft, potential, dirp,
                                     params.weight_dtype)
        step_fn = make_step_fn(params, base_flat, dirp, table)
        state = init_state(params, starts, jax.random.key(0))

        @jax.jit
        def run(state):
            return jax.lax.scan(lambda s, _: (step_fn(s), None), state,
                                None, length=STEPS)[0]

        out = run(state)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        out = run(out)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        dt = time.perf_counter() - t0
        print(f'impl={impl:10s} {dt / STEPS * 1e6:9.1f} us/step '
              f'{N * STEPS / dt / 1e6:8.1f} M agent-steps/s', flush=True)

    # the chunk-hist runner at the same population (one batched pallas
    # histogram per STEPS-scan)
    params = TrackParams(grid_shape=(NROW, NCOL), move_dirn=0., nu=1.,
                         memory_k=1, burnin=50, nsteps=10_000_000,
                         presence_impl='chunk-hist')
    base_flat = prepared_weights(updraft, potential, dirp,
                                 params.weight_dtype)
    st = init_state(params, starts, jax.random.key(0))
    args = (params, base_flat, dirp, table, st.pos, st.mem, st.alive,
            st.key, st.presence, st.step, STEPS)
    out = _run_chunk_hist(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    out = _run_chunk_hist(params, base_flat, dirp, table, out[0], out[1],
                          out[2], out[3], out[4], out[5], STEPS)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    dt = time.perf_counter() - t0
    print(f'impl=chunk-hist {dt / STEPS * 1e6:7.1f} us/step '
          f'{N * STEPS / dt / 1e6:8.1f} M agent-steps/s', flush=True)


if __name__ == '__main__':
    main()

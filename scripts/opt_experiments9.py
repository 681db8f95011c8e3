"""Round-2 production-step experiments with a tighter harness (median of
reps, real make_step_fn, fixed 100k population, presence_impl='matmul').

Candidates from ablate_step3.py's (noisy) single-shot screen:
  A. one-hot move-delta lookup instead of deltas[mi] (a (N,9)x(9,2) MXU
     matmul replaces a small-table gather)
  B. RBG PRNG instead of threefry (TPU has a hardware RNG; threefry is
     ~20 vector ops per uniform)
  C. both
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
from ssrs_tpu.agents import simulate as sim_mod
from ssrs_tpu.agents.simulate import (TrackParams, init_state,
                                      make_step_fn, prepared_weights)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256
REPS = 5


def fields():
    y = np.linspace(0, np.pi, NROW)[:, None]
    x = np.linspace(0, 2 * np.pi, NCOL)[None, :]
    updraft = (1.0 + 0.8 * np.sin(3 * x) * np.sin(2 * y)).astype(np.float32)
    potential = (np.linspace(1000., 0., NROW)[:, None]
                 * np.ones((1, NCOL))).astype(np.float32)
    return updraft, potential


def bench(name, step_fn, state0):
    @jax.jit
    def run(state):
        return jax.lax.scan(lambda s, _: (step_fn(s), None), state, None,
                            length=STEPS)[0]

    out = run(state0)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(out)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f'{name:36s} {med / STEPS * 1e6:9.1f} us/step '
          f'{N * STEPS / med / 1e6:8.1f} M agent-steps/s  '
          f'(spread {min(times)/STEPS*1e6:.0f}-{max(times)/STEPS*1e6:.0f})',
          flush=True)


def main():
    rng = np.random.default_rng(0)
    updraft, potential = fields()
    dirp = jnp.asarray(directional_probs(0.))
    table = jnp.asarray(restriction_table())
    starts = np.stack([rng.integers(1, NROW - 1, N),
                       rng.integers(1, NCOL - 1, N)], 1).astype(np.int32)
    params = TrackParams(grid_shape=(NROW, NCOL), move_dirn=0., nu=1.,
                         memory_k=1, burnin=50, nsteps=10_000_000,
                         presence_impl='matmul')
    base_flat = prepared_weights(updraft, potential, dirp,
                                 params.weight_dtype)
    print(f'device: {jax.devices()[0]}  N={N}  presence=matmul  '
          f'reps={REPS}', flush=True)

    def state0(key):
        return init_state(params, starts, key)

    # baseline
    step = make_step_fn(params, base_flat, dirp, table)
    bench('baseline threefry', step, state0(jax.random.key(0)))

    # A: one-hot delta — patch the module-level lookup path by monkey
    # patching NEIGHBOR_DELTAS gather inside a copied step is invasive;
    # instead rebuild the step with a wrapped deltas table lookup.
    orig_step_fn = sim_mod.make_step_fn

    # B: rbg keys (the step uses jax.random.split/uniform on whatever
    # key impl the carried key has)
    key_rbg = jax.random.key(0, impl='rbg')
    bench('rbg prng', step, state0(key_rbg))

    key_urbg = jax.random.key(0, impl='unsafe_rbg')
    bench('unsafe_rbg prng', step, state0(key_urbg))


if __name__ == '__main__':
    main()

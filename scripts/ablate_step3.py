"""Round-2 inner-step ablation on real TPU: where do the ~1700 us/step
(100k agents, presence removed) actually go?

Suspects, each toggled independently against the production step
(make_step_fn semantics, presence_impl='none'):

  gather   — the 9-float bf16 row gather from the (nrow*ncol, 9) table
  memmask  — restriction-mask lookup jnp.take(table, mem) (tiny table,
             but XLA may emit a real gather); variant replaces it with a
             one-hot (N,9)@(9,9) MXU matmul
  rng      — per-step threefry split+uniform; variants: rbg generator,
             and no RNG at all (fixed u) as the lower bound
  deltas   — the (N,)->(9,2) move-delta lookup; variant uses one-hot
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

from ssrs_tpu.agents.moves import (CENTER_ZERO, NEIGHBOR_DELTAS,
                                   directional_probs, restriction_table)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256
BURNIN = 50

table_j = jnp.asarray(restriction_table())
dirp_j = jnp.asarray(directional_probs(0.))
center0_j = jnp.asarray(CENTER_ZERO)
deltas_j = jnp.asarray(NEIGHBOR_DELTAS)


def make_step(base_flat, *, gather=True, onehot_mask=False,
              rng='threefry', onehot_delta=False):
    dirp_c0 = dirp_j * center0_j

    def step(state):
        pos, mem, key, step_i = state
        r, c = pos[:, 0], pos[:, 1]

        if onehot_mask:
            oh = (mem[:, 0:1] == jnp.arange(9)[None, :]).astype(
                jnp.float32)
            mask = center0_j[None, :] * (oh @ table_j.astype(jnp.float32))
        else:
            mask = center0_j[None, :] * jnp.prod(
                jnp.take(table_j, mem, axis=0), axis=1)

        if gather:
            idx = r * NCOL + c
            base = base_flat.at[idx].get(
                mode='promise_in_bounds').astype(jnp.float32)
        else:
            base = jnp.broadcast_to(dirp_c0[None, :], (N, 9)) * 7.0

        p = base * mask
        allz = jnp.sum(p, axis=1, keepdims=True) == 0.
        p = jnp.where(allz, dirp_c0[None, :] * mask, p)
        allz = jnp.sum(p, axis=1, keepdims=True) == 0.
        p = jnp.where(allz, dirp_j[None, :], p)

        if rng == 'none':
            u = jnp.full((N,), 0.5, jnp.float32)
        else:
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (N,), dtype=p.dtype)
        u = jnp.maximum(u, jnp.finfo(p.dtype).tiny)
        cum = jnp.cumsum(p, axis=1)
        mi = jnp.sum(cum < u[:, None] * cum[:, -1:],
                     axis=1).astype(jnp.int32)
        mi = jnp.minimum(mi, 8)

        if onehot_delta:
            ohm = (mi[:, None] == jnp.arange(9)[None, :]).astype(jnp.int32)
            d = ohm @ deltas_j
        else:
            d = deltas_j[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        new_mem = jnp.concatenate([mem[:, 1:], mi[:, None]], axis=1)
        return (jnp.stack([nr, nc], 1), new_mem, key, step_i + 1)

    return step


def bench(name, step):
    @jax.jit
    def run(state):
        return jax.lax.scan(lambda s, _: (step(s), None), state, None,
                            length=STEPS)[0]

    rng_np = np.random.default_rng(0)
    pos = jnp.asarray(np.stack([rng_np.integers(1, NROW - 1, N),
                                rng_np.integers(1, NCOL - 1, N)], 1),
                      jnp.int32)
    mem = jnp.full((N, 1), 4, jnp.int32)
    state = (pos, mem, jax.random.key(0), jnp.int32(0))
    out = run(state)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    out = run(out)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    dt = time.perf_counter() - t0
    print(f'{name:40s} {dt / STEPS * 1e6:9.1f} us/step '
          f'{N * STEPS / dt / 1e6:8.1f} M agent-steps/s', flush=True)


def main():
    rng_np = np.random.default_rng(1)
    base_bf16 = jnp.asarray(
        rng_np.random((NROW * NCOL, 9), np.float32) + 0.1
    ).astype(jnp.bfloat16)
    print(f'device: {jax.devices()[0]}  N={N}', flush=True)

    bench('full (prod equivalent)', make_step(base_bf16))
    bench('- table gather', make_step(base_bf16, gather=False))
    bench('+ onehot memmask', make_step(base_bf16, onehot_mask=True))
    bench('+ onehot delta', make_step(base_bf16, onehot_delta=True))
    bench('+ onehot mask+delta',
          make_step(base_bf16, onehot_mask=True, onehot_delta=True))
    bench('- rng (fixed u)', make_step(base_bf16, rng='none'))
    bench('- rng - gather',
          make_step(base_bf16, gather=False, rng='none'))


if __name__ == '__main__':
    main()

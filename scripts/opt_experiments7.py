"""Round 7: amortize histogram fixed overhead — unroll K steps per scan
iteration, one batched one-hot matmul per K steps."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.agents.moves import (CENTER_ZERO, NEIGHBOR_DELTAS,
                                   directional_probs, restriction_table)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256

table_j = jnp.asarray(restriction_table())
dirp_j = jnp.asarray(directional_probs(0.))
center0_j = jnp.asarray(CENTER_ZERO)
dirp_c0 = dirp_j * center0_j
deltas_j = jnp.asarray(NEIGHBOR_DELTAS)


def core(pos, mem, key, base_flat):
    r, c = pos[:, 0], pos[:, 1]
    idx = r * NCOL + c
    base = base_flat.at[idx].get(
        mode='promise_in_bounds').astype(jnp.float32)
    mask = center0_j[None, :] * jnp.take(table_j, mem[:, 0], axis=0)
    p = base * mask
    allz = jnp.sum(p, axis=1, keepdims=True) == 0.
    p = jnp.where(allz, dirp_c0[None, :] * mask, p)
    allz = jnp.sum(p, axis=1, keepdims=True) == 0.
    p = jnp.where(allz, dirp_j[None, :], p)
    key, sub = jax.random.split(key)
    u = jax.random.uniform(sub, (N,), dtype=p.dtype)
    cum = jnp.cumsum(p, axis=1)
    mi = jnp.minimum(jnp.sum(cum < u[:, None] * cum[:, -1:], axis=1),
                     8).astype(jnp.int32)
    d = deltas_j[mi]
    nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
    nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
    return jnp.stack([nr, nc], 1), mi[:, None], key


def hist_matmul(rs, cs):
    """rs, cs: (M,) int32 -> (NROW, NCOL) int32 histogram."""
    oh_r = (rs[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, NROW), 1)).astype(jnp.int8)
    oh_c = (cs[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
    return jax.lax.dot_general(oh_r, oh_c, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def build(base_flat, k_unroll):
    def macro_step(state):
        pos, mem, presence, key = state
        all_pos = []
        for _ in range(k_unroll):
            pos, mem, key = core(pos, mem, key, base_flat)
            all_pos.append(pos)
        stacked = jnp.concatenate(all_pos, axis=0)   # (K*N, 2)
        presence = presence + hist_matmul(stacked[:, 0], stacked[:, 1])
        return (pos, mem, presence, key), None

    @jax.jit
    def run(pos, key):
        mem = (pos[:, :1] * 0 + 4)
        presence = jnp.zeros((NROW, NCOL), jnp.int32)
        state, _ = jax.lax.scan(lambda s, _: macro_step(s),
                                (pos, mem, presence, key), None,
                                length=STEPS // k_unroll)
        return state[2]
    return run


def bench(name, run, pos, key):
    out = run(pos, key)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = run(pos, key)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f'{name:40s} {dt / STEPS * 1e6:8.1f} us/step '
          f'{N * STEPS / dt / 1e6:7.1f} M/s', flush=True)


def main():
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((NROW * NCOL, 9), np.float32)).astype(
        jnp.bfloat16)
    pos = jnp.asarray(np.stack([rng.integers(1, NROW - 1, N),
                                rng.integers(1, NCOL - 1, N)], 1),
                      jnp.int32)
    key = jax.random.key(0)
    for k in [1, 2, 4, 8]:
        bench(f'K={k} batched histogram', build(base, k), pos, key)


if __name__ == '__main__':
    main()

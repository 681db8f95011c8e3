"""Optimization experiments for the lockstep step on real TPU.

Variants measured against the current full step:
  A. baseline (random agent order, f32 table, in-scan scatter)
  B. agents pre-sorted by cell index (gather/scatter locality)
  C. bf16 move-weight table (half the gather bytes)
  D. positions emitted per step; ONE batched scatter per chunk
  E. B + C + D
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.agents.moves import (CENTER_ZERO, NEIGHBOR_DELTAS,
                                   directional_probs,
                                   move_probability_cascade,
                                   restriction_table)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256

table_j = jnp.asarray(restriction_table())
dirp_j = jnp.asarray(directional_probs(0.))
center0_j = jnp.asarray(CENTER_ZERO)
deltas_j = jnp.asarray(NEIGHBOR_DELTAS)


def make_step(base_flat, emit_positions):
    def step(state):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        base = jnp.take(base_flat, idx, axis=0).astype(jnp.float32)
        mask = center0_j[None, :] * jnp.take(table_j, mem[:, 0], axis=0)
        q = move_probability_cascade(base, mask, dirp_j, 1.0)
        key, sub = jax.random.split(key)
        cum = jnp.cumsum(q, axis=1)
        u = jax.random.uniform(sub, (N, 1)) * cum[:, -1:]
        mi = jnp.minimum(jnp.sum(cum < u, axis=1), 8).astype(jnp.int32)
        d = deltas_j[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        flat = nr * NCOL + nc
        if not emit_positions:
            presence = presence.at[flat].add(1)
        new_state = (jnp.stack([nr, nc], 1), mi[:, None], presence, key)
        return new_state, (flat if emit_positions else None)
    return step


def run_variant(name, base_flat, pos0, emit_positions):
    step = make_step(base_flat, emit_positions)

    @jax.jit
    def run(pos, key):
        mem = (pos[:, :1] * 0 + 4)
        presence = jnp.zeros((NROW * NCOL,), jnp.int32)
        state = (pos, mem, presence, key)
        state, ys = jax.lax.scan(lambda s, _: step(s), state, None,
                                 length=STEPS)
        pos, mem, presence, key = state
        if emit_positions:
            presence = presence.at[ys.reshape(-1)].add(1)
        return presence

    key = jax.random.key(0)
    out = run(pos0, key)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = run(pos0, key)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f'{name:44s} {dt / STEPS * 1e6:9.1f} us/step '
          f'{N * STEPS / dt / 1e6:8.1f} M agent-steps/s', flush=True)


def main():
    rng = np.random.default_rng(0)
    base_f32 = jnp.asarray(rng.random((NROW * NCOL, 9), np.float32))
    base_bf16 = base_f32.astype(jnp.bfloat16)

    pos_rand = jnp.asarray(np.stack([rng.integers(1, NROW - 1, N),
                                     rng.integers(1, NCOL - 1, N)], 1),
                           jnp.int32)
    flat = np.asarray(pos_rand[:, 0] * NCOL + pos_rand[:, 1])
    order = np.argsort(flat)
    pos_sorted = pos_rand[order]

    run_variant('A baseline', base_f32, pos_rand, False)
    run_variant('B sorted agents', base_f32, pos_sorted, False)
    run_variant('C bf16 table', base_bf16, pos_rand, False)
    run_variant('D chunk-batched scatter', base_f32, pos_rand, True)
    run_variant('E sorted + bf16 + batched', base_bf16, pos_sorted, True)


if __name__ == '__main__':
    main()

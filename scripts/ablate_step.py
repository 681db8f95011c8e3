"""Ablation profile of the lockstep step on real TPU: which component
dominates per-step time (gather, cascade, sampling, scatter)."""

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


def bench(name, step_fn, state):
    @jax.jit
    def run(state):
        return jax.lax.scan(lambda s, _: (step_fn(s), None), state, None,
                            length=STEPS)[0]
    out = run(state)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    out = run(state)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    dt = time.perf_counter() - t0
    print(f'{name:36s} {dt / STEPS * 1e6:9.1f} us/step '
          f'{N * STEPS / dt / 1e6:8.1f} M agent-steps/s')
    return dt


def main():
    rng = np.random.default_rng(0)
    base_flat = jnp.asarray(rng.random((NROW * NCOL, 9), np.float32))
    table = jnp.asarray(restriction_table())
    dirp = jnp.asarray(directional_probs(0.))
    center0 = jnp.asarray(CENTER_ZERO)
    deltas = jnp.asarray(NEIGHBOR_DELTAS)

    pos = jnp.asarray(np.stack([rng.integers(1, NROW - 1, N),
                                rng.integers(1, NCOL - 1, N)], 1), jnp.int32)
    mem = jnp.full((N, 1), 4, jnp.int32)
    presence = jnp.zeros((NROW * NCOL,), jnp.int32)
    key = jax.random.key(0)
    state0 = (pos, mem, presence, key)

    def step_full(state):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        base = jnp.take(base_flat, idx, axis=0)
        mask = center0[None, :] * jnp.take(table, mem[:, 0], axis=0)
        q = move_probability_cascade(base, mask, dirp, 1.0)
        key, sub = jax.random.split(key)
        cum = jnp.cumsum(q, axis=1)
        u = jax.random.uniform(sub, (N, 1)) * cum[:, -1:]
        mi = jnp.minimum(jnp.sum(cum < u, axis=1), 8).astype(jnp.int32)
        d = deltas[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        presence = presence.at[nr * NCOL + nc].add(1)
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key)

    def step_no_scatter(state):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        base = jnp.take(base_flat, idx, axis=0)
        mask = center0[None, :] * jnp.take(table, mem[:, 0], axis=0)
        q = move_probability_cascade(base, mask, dirp, 1.0)
        key, sub = jax.random.split(key)
        cum = jnp.cumsum(q, axis=1)
        u = jax.random.uniform(sub, (N, 1)) * cum[:, -1:]
        mi = jnp.minimum(jnp.sum(cum < u, axis=1), 8).astype(jnp.int32)
        d = deltas[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key)

    def step_no_gather(state):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        base = jnp.broadcast_to(dirp[None], (N, 9)) * (
            1. + 0.001 * r[:, None])
        mask = center0[None, :] * jnp.take(table, mem[:, 0], axis=0)
        q = move_probability_cascade(base, mask, dirp, 1.0)
        key, sub = jax.random.split(key)
        cum = jnp.cumsum(q, axis=1)
        u = jax.random.uniform(sub, (N, 1)) * cum[:, -1:]
        mi = jnp.minimum(jnp.sum(cum < u, axis=1), 8).astype(jnp.int32)
        d = deltas[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        presence = presence.at[nr * NCOL + nc].add(1)
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key)

    def step_no_cascade(state):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        base = jnp.take(base_flat, idx, axis=0)
        q = base
        key, sub = jax.random.split(key)
        cum = jnp.cumsum(q, axis=1)
        u = jax.random.uniform(sub, (N, 1)) * cum[:, -1:]
        mi = jnp.minimum(jnp.sum(cum < u, axis=1), 8).astype(jnp.int32)
        d = deltas[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        presence = presence.at[nr * NCOL + nc].add(1)
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key)

    def step_minimal(state):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        key, sub = jax.random.split(key)
        mi = jax.random.randint(sub, (N,), 0, 9)
        d = deltas[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key)

    bench('full step', step_full, state0)
    bench('no presence scatter', step_no_scatter, state0)
    bench('no base gather', step_no_gather, state0)
    bench('no cascade', step_no_cascade, state0)
    bench('minimal (rng+move only)', step_minimal, state0)


if __name__ == '__main__':
    main()

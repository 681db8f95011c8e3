"""Bisect the step-rewrite regression: gather mode, scatter mode,
uniform hoisting — each toggled independently."""

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


def build(base_flat, gather_mode, scatter_mode, hoist_u):
    def step(state, u):
        pos, mem, presence, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        if gather_mode == 'promise':
            base = base_flat.at[idx].get(
                mode='promise_in_bounds').astype(jnp.float32)
        else:
            base = jnp.take(base_flat, idx, axis=0).astype(jnp.float32)
        mask = center0_j[None, :] * jnp.take(table_j, mem[:, 0], axis=0)
        p = base * mask
        allz = jnp.sum(p, axis=1, keepdims=True) == 0.
        p = jnp.where(allz, dirp_c0[None, :] * mask, p)
        allz = jnp.sum(p, axis=1, keepdims=True) == 0.
        p = jnp.where(allz, dirp_j[None, :], p)
        if not hoist_u:
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (N,), dtype=p.dtype)
        cum = jnp.cumsum(p, axis=1)
        mi = jnp.sum(cum < u[:, None] * cum[:, -1:],
                     axis=1).astype(jnp.int32)
        mi = jnp.minimum(mi, 8)
        d = deltas_j[mi]
        nr = jnp.clip(r + d[:, 0], 1, NROW - 2)
        nc = jnp.clip(c + d[:, 1], 1, NCOL - 2)
        flat = nr * NCOL + nc
        if scatter_mode == 'promise':
            presence = presence.at[flat].add(1, mode='promise_in_bounds')
        else:
            presence = presence.at[flat].add(1)
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key), None

    @jax.jit
    def run(pos, key):
        mem = (pos[:, :1] * 0 + 4)
        presence = jnp.zeros((NROW * NCOL,), jnp.int32)
        if hoist_u:
            key, sub = jax.random.split(key)
            us = jax.random.uniform(sub, (STEPS, N))
            state, _ = jax.lax.scan(lambda s, u: step(s, u),
                                    (pos, mem, presence, key), us)
        else:
            state, _ = jax.lax.scan(lambda s, _: step(s, None),
                                    (pos, mem, presence, key), None,
                                    length=STEPS)
        return state[2]
    return run


def bench(name, run, pos, key):
    out = run(pos, key)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = run(pos, key)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(f'{name:46s} {dt / STEPS * 1e6:8.1f} us/step '
          f'{N * STEPS / dt / 1e6:7.1f} M/s', flush=True)


def main():
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((NROW * NCOL, 9), np.float32)).astype(
        jnp.bfloat16)
    pos = jnp.asarray(np.stack([rng.integers(1, NROW - 1, N),
                                rng.integers(1, NCOL - 1, N)], 1),
                      jnp.int32)
    key = jax.random.key(0)
    bench('take / add / per-step u  (old)',
          build(base, 'take', 'plain', False), pos, key)
    bench('promise gather only',
          build(base, 'promise', 'plain', False), pos, key)
    bench('promise scatter only',
          build(base, 'take', 'promise', False), pos, key)
    bench('hoisted uniforms only',
          build(base, 'take', 'plain', True), pos, key)
    bench('all three (new)',
          build(base, 'promise', 'promise', True), pos, key)


if __name__ == '__main__':
    main()

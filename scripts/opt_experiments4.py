"""Round 4: presence-scatter strategies and u8 weight tables."""

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


def build(base_flat, scatter: str):
    nbanks = 8

    def step(state):
        pos, mem, presence, key = state
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
        flat = nr * NCOL + nc
        if scatter == 'i32':
            presence = presence.at[flat].add(1, mode='promise_in_bounds')
        elif scatter == 'f32':
            presence = presence.at[flat].add(1., mode='promise_in_bounds')
        elif scatter == 'banked':
            bank = jax.lax.broadcasted_iota(jnp.int32, (N,), 0) % nbanks
            presence = presence.at[bank, flat].add(
                1, mode='promise_in_bounds')
        elif scatter == 'none':
            pass
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key), None

    @jax.jit
    def run(pos, key):
        mem = (pos[:, :1] * 0 + 4)
        if scatter == 'f32':
            presence = jnp.zeros((NROW * NCOL,), jnp.float32)
        elif scatter == 'banked':
            presence = jnp.zeros((nbanks, NROW * NCOL), jnp.int32)
        else:
            presence = jnp.zeros((NROW * NCOL,), jnp.int32)
        state, _ = jax.lax.scan(lambda s, _: step(s),
                                (pos, mem, presence, key), None,
                                length=STEPS)
        out = state[2]
        if scatter == 'banked':
            out = out.sum(axis=0)
        return out

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
    base_f32 = np.asarray(rng.random((NROW * NCOL, 9), np.float32))
    base_bf16 = jnp.asarray(base_f32).astype(jnp.bfloat16)
    norm = base_f32 / base_f32.max(axis=1, keepdims=True)
    base_u8 = jnp.asarray(np.round(norm * 255).astype(np.uint8))

    pos = jnp.asarray(np.stack([rng.integers(1, NROW - 1, N),
                                rng.integers(1, NCOL - 1, N)], 1),
                      jnp.int32)
    key = jax.random.key(0)
    bench('bf16 / i32 scatter (current)',
          build(base_bf16, 'i32'), pos, key)
    bench('bf16 / f32 scatter', build(base_bf16, 'f32'), pos, key)
    bench('bf16 / banked scatter', build(base_bf16, 'banked'), pos, key)
    bench('bf16 / no scatter', build(base_bf16, 'none'), pos, key)
    bench('u8 / i32 scatter', build(base_u8, 'i32'), pos, key)


if __name__ == '__main__':
    main()

"""Round 5: the presence scatter is ~92% of step cost. Try:
  A. per-step sort + indices_are_sorted scatter
  B. one-hot matmul histogram: counts += OneHotRows.T @ OneHotCols (MXU)
  C. scatter every K steps on a buffered (K, N) position block
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
                                   directional_probs, restriction_table)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256

table_j = jnp.asarray(restriction_table())
dirp_j = jnp.asarray(directional_probs(0.))
center0_j = jnp.asarray(CENTER_ZERO)
dirp_c0 = dirp_j * center0_j
deltas_j = jnp.asarray(NEIGHBOR_DELTAS)


def core(state, base_flat):
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
    return nr, nc, mi, key


def build(base_flat, mode: str):
    def step(state):
        pos, mem, presence, key = state
        nr, nc, mi, key = core(state, base_flat)
        flat = nr * NCOL + nc
        if mode == 'scatter':
            presence = presence.at[flat].add(1, mode='promise_in_bounds')
        elif mode == 'sorted':
            sflat = jnp.sort(flat)
            presence = presence.at[sflat].add(
                1, mode='promise_in_bounds', indices_are_sorted=True)
        elif mode == 'matmul':
            oh_r = (nr[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NROW), 1)).astype(jnp.bfloat16)
            oh_c = (nc[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NCOL), 1)).astype(jnp.bfloat16)
            upd = jax.lax.dot_general(
                oh_r, oh_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            presence = presence + upd
        return (jnp.stack([nr, nc], 1), mi[:, None], presence, key), None

    @jax.jit
    def run(pos, key):
        mem = (pos[:, :1] * 0 + 4)
        if mode == 'matmul':
            presence = jnp.zeros((NROW, NCOL), jnp.float32)
        else:
            presence = jnp.zeros((NROW * NCOL,), jnp.int32)
        state, _ = jax.lax.scan(lambda s, _: step(s),
                                (pos, mem, presence, key), None,
                                length=STEPS)
        return state[2]
    return run


def build_buffered(base_flat, every: int):
    """Scatter once per `every` steps from a (every, N) position block."""
    def inner_step(state):
        pos, mem, buf, j, key = state
        nr, nc, mi, key = core((pos, mem, None, key), base_flat)
        flat = nr * NCOL + nc
        buf = jax.lax.dynamic_update_index_in_dim(buf, flat, j, 0)
        return (jnp.stack([nr, nc], 1), mi[:, None], buf, j + 1, key)

    def outer_step(carry):
        pos, mem, presence, key = carry
        buf = jnp.zeros((every, N), jnp.int32)
        st = (pos, mem, buf, jnp.asarray(0, jnp.int32), key)
        st, _ = jax.lax.scan(lambda s, _: (inner_step(s), None), st, None,
                             length=every)
        pos, mem, buf, _, key = st
        presence = presence.at[buf.reshape(-1)].add(
            1, mode='promise_in_bounds')
        return (pos, mem, presence, key), None

    @jax.jit
    def run(pos, key):
        mem = (pos[:, :1] * 0 + 4)
        presence = jnp.zeros((NROW * NCOL,), jnp.int32)
        state, _ = jax.lax.scan(lambda s, _: outer_step(s),
                                (pos, mem, presence, key), None,
                                length=STEPS // every)
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
    bench('A sorted scatter', build(base, 'sorted'), pos, key)
    bench('B one-hot matmul', build(base, 'matmul'), pos, key)
    bench('C buffered scatter (every 16)',
          build_buffered(base, 16), pos, key)
    bench('baseline scatter', build(base, 'scatter'), pos, key)

    # correctness cross-check: matmul histogram == scatter histogram
    p1 = np.asarray(build(base, 'scatter')(pos, key)).reshape(NROW, NCOL)
    p2 = np.asarray(build(base, 'matmul')(pos, key))
    print('matmul == scatter:', (p1 == p2.astype(np.int64)).all())


if __name__ == '__main__':
    main()

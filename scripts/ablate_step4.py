"""Trustworthy re-ablation of the production (9, N) agent step on TPU.

Earlier ablations (ablate_step*.py, opt_experiments*.py) timed with
block_until_ready, which does NOT reliably sync on axon (CLAUDE.md);
this harness times a chained scan whose output scalar is materialized
with np.asarray, marginal between two scan lengths. The step body is the
production make_step_fn math (agents/simulate.py) with independently
toggleable parts.
"""

import functools
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
N = int(os.environ.get('ABLATE_N', 100_000))
S1, S2 = 192, 384

dirp_np = directional_probs(0.)
table_np = restriction_table()


def make_variant(*, gather=True, memmask=True, rng=True, cascade=True,
                 presence='none', transpose=True, prod_extras=False):
    # memmask: True (take), 'onehot' (9x9 matmul), False (off)
    # prod_extras: replicate the production step's alive/burnin/cond
    # bookkeeping (make_step_fn) on top of the core math
    deltas = jnp.asarray(NEIGHBOR_DELTAS)
    center0 = jnp.asarray(CENTER_ZERO)
    dirp = jnp.asarray(dirp_np)
    table_T = jnp.asarray(table_np).T
    dirp_T = dirp[:, None]
    dirp_c0_T = (dirp * center0)[:, None]
    center0_T = center0[:, None]
    dr_tab, dc_tab = deltas[:, 0], deltas[:, 1]

    def step(carry, base_flat):
        pos, mem, key, presence_arr = carry
        r, c = pos[:, 0], pos[:, 1]
        if prod_extras:
            step_i = jnp.sum(mem[:, 0]) * 0 + 60  # traced scalar
            in_interior = ((r > 0) & (r < NROW - 1) & (c > 0) &
                           (c < NCOL - 1))
            past_burnin = step_i > 50
            under_cap = step_i < 10000
            alive = in_interior & (in_interior | ~past_burnin) & under_cap
            pr, pc = jax.lax.cond(
                past_burnin,
                lambda rc: rc,
                lambda rc: (jnp.where(rc[0] <= 1, rc[0] + 2, rc[0]),
                            jnp.where(rc[1] <= 0, rc[1] + 2, rc[1])),
                (r, c))
            pr = jnp.clip(pr, 1, NROW - 2)
            pc = jnp.clip(pc, 1, NCOL - 2)
        else:
            alive = None
            pr = jnp.clip(r, 1, NROW - 2)
            pc = jnp.clip(c, 1, NCOL - 2)

        if memmask == 'onehot':
            ohm = (mem[:, 0][None, :] ==
                   jax.lax.broadcasted_iota(jnp.int32, (9, 1), 0)
                   ).astype(jnp.float32)           # (9, N)
            mask = center0_T * jax.lax.dot_general(
                table_T.astype(jnp.float32), ohm,
                (((1,), (0,)), ((), ())))
        elif memmask:
            mask = center0_T * jnp.take(table_T, mem[:, 0], axis=1)
        else:
            mask = center0_T * jnp.ones((9, N), jnp.float32)

        if gather:
            idx = pr * NCOL + pc
            g = base_flat.at[idx].get(mode='promise_in_bounds')
            base = (g.T if transpose else
                    g.reshape(N, 9).swapaxes(0, 1)).astype(jnp.float32)
        else:
            base = jnp.broadcast_to(dirp_c0_T, (9, N)) * 7.0

        p = base * mask
        if cascade:
            allz = jnp.sum(p, axis=0, keepdims=True) == 0.
            p = jnp.where(allz, dirp_c0_T * mask, p)
            allz = jnp.sum(p, axis=0, keepdims=True) == 0.
            p = jnp.where(allz, dirp_T, p)

        if rng:
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (N,), dtype=p.dtype)
        else:
            u = jnp.full((N,), 0.5, p.dtype) * (1 + 1e-12 * p[0, 0])
        u = jnp.maximum(u, jnp.finfo(p.dtype).tiny)
        cum = jnp.cumsum(p, axis=0)
        mi = jnp.sum(cum < u[None, :] * cum[-1:, :],
                     axis=0).astype(jnp.int32)
        mi = jnp.minimum(mi, 8)

        if prod_extras:
            new_r = jnp.where(alive, pr + jnp.take(dr_tab, mi), r)
            new_c = jnp.where(alive, pc + jnp.take(dc_tab, mi), c)
            new_r = jnp.clip(new_r, 1, NROW - 2)
            new_c = jnp.clip(new_c, 1, NCOL - 2)
            new_pos = jnp.stack([new_r, new_c], axis=1)
            new_mem = jnp.concatenate([mem[:, 1:], mi[:, None]], axis=1)
            new_mem = jnp.where(alive[:, None], new_mem, mem)
        else:
            new_r = jnp.clip(pr + jnp.take(dr_tab, mi), 1, NROW - 2)
            new_c = jnp.clip(pc + jnp.take(dc_tab, mi), 1, NCOL - 2)
            new_pos = jnp.stack([new_r, new_c], axis=1)
            new_mem = jnp.concatenate([mem[:, 1:], mi[:, None]], axis=1)

        if presence == 'emit':
            return (new_pos, new_mem, key, presence_arr), (
                new_r.astype(jnp.int16), new_c.astype(jnp.int16))
        if presence == 'matmul':
            oh_r = (new_r[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NROW), 1)).astype(jnp.int8)
            oh_c = (new_c[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
            upd = jax.lax.dot_general(
                oh_r, oh_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            presence_arr = presence_arr + upd
        return (new_pos, new_mem, key, presence_arr)

    return step


def bench(name, step, base, unroll=1):
    @functools.partial(jax.jit, static_argnames=('length', 'unr'))
    def run(base, length: int, unr: int):
        rngk = jax.random.key(0)
        pos0 = jnp.stack(
            [jnp.full((N,), NROW // 2, jnp.int32),
             jnp.full((N,), NCOL // 2, jnp.int32)], 1)
        mem0 = jnp.full((N, 1), 4, jnp.int32)
        pres0 = jnp.zeros((NROW, NCOL), jnp.int32)
        carry = (pos0, mem0, rngk, pres0)

        def body(carryx, _):
            out = step(carryx, base)
            if isinstance(out, tuple) and len(out) == 2 and isinstance(
                    out[1], tuple):
                return out
            return out, ()

        carry, ys = jax.lax.scan(body, carry, None, length=length,
                                 unroll=unr)
        if ys != () and ys is not None and not (isinstance(ys, tuple)
                                                and len(ys) == 0):
            from ssrs_tpu.agents.pallas_hist import \
                presence_histogram_batch
            rows, cols = ys
            upd = presence_histogram_batch(rows.reshape(-1),
                                           cols.reshape(-1), NROW, NCOL)
            carry = (carry[0], carry[1], carry[2], carry[3] + upd)
        pos, mem, key, pres = carry
        return (jnp.sum(pos) + jnp.sum(mem) + jnp.sum(pres) +
                jax.random.bits(key, (1,))[0].astype(jnp.int32))

    def go(length):
        np.asarray(run(base, length, unroll))

    go(S1); go(S2)
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    print(f'{name:44s} {per*1e6:8.1f} us/step '
          f'{N/per/1e6:8.1f} M steps/s', flush=True)


def main():
    rng_np = np.random.default_rng(1)
    base = jnp.asarray(rng_np.random((NROW * NCOL, 9), np.float32) + 0.1
                       ).astype(jnp.bfloat16)
    print(f'device: {jax.devices()[0]}  N={N} grid {NROW}x{NCOL}',
          flush=True)

    best = make_variant(memmask='onehot', presence='matmul')
    bench('core (onehot mask + matmul presence) u8', best, base,
          unroll=8)
    bench('core + production extras u8',
          make_variant(memmask='onehot', presence='matmul',
                       prod_extras=True), base, unroll=8)


if __name__ == '__main__':
    main()

"""Fused Pallas agent-step experiment on TPU (round 3).

Compares the production XLA step (one-hot memmask + in-scan matmul
presence, agents/simulate.py) against the fused Pallas kernel
(agents/fused_step.py) that keeps the one-hot histogram operands in VMEM.
Timing: chained scan, marginal between two lengths, np.asarray sync
(block_until_ready lies on axon — CLAUDE.md).

Env: FUSED_N (default 100000), FUSED_K (memory 1)
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
from ssrs_tpu.agents.fused_step import fused_step_call

NROW, NCOL = 500, 600
N = int(os.environ.get('FUSED_N', 98_304))
K = int(os.environ.get('FUSED_K', 1))
S1, S2 = 96, 224
NROW_P = ((NROW + 7) // 8) * 8
NCOL_P = ((NCOL + 127) // 128) * 128

dirp_np = directional_probs(0.)
table_np = restriction_table()


def alive_push(r, c, mem):
    """Production alive/burnin bookkeeping (mirrors make_step_fn)."""
    step_i = jnp.sum(mem[0, :3]) * 0 + 60     # traced scalar, past burnin
    in_interior = (r > 0) & (r < NROW - 1) & (c > 0) & (c < NCOL - 1)
    past_burnin = step_i > 50
    under_cap = step_i < 10000
    alive = (in_interior | ~past_burnin) & under_cap
    pr = jnp.clip(r, 1, NROW - 2)
    pc = jnp.clip(c, 1, NCOL - 2)
    return alive, pr, pc


def make_xla_step():
    """Production step math (one-hot memmask, matmul presence)."""
    deltas = jnp.asarray(NEIGHBOR_DELTAS)
    center0 = jnp.asarray(CENTER_ZERO)
    dirp = jnp.asarray(dirp_np)
    table_T = jnp.asarray(table_np).T
    dirp_T = dirp[:, None]
    dirp_c0_T = (dirp * center0)[:, None]
    center0_T = center0[:, None]
    dr_tab, dc_tab = deltas[:, 0], deltas[:, 1]

    def step(carry, base_flat):
        r, c, mem, key, pres = carry[:5]
        alive, pr, pc = alive_push(r, c, mem)
        mask = None
        for k in range(K):
            ohm = (mem[k][None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (9, 1), 0)).astype(jnp.float32)
            mcol = jax.lax.dot_general(
                table_T.astype(jnp.float32), ohm, (((1,), (0,)), ((), ())))
            mask = mcol if mask is None else mask * mcol
        mask = center0_T * mask
        idx = pr * NCOL + pc
        base = base_flat.at[idx].get(
            mode='promise_in_bounds').T.astype(jnp.float32)
        p = base * mask
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_c0_T * mask, p)
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_T, p)
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (N,), dtype=p.dtype)
        u = jnp.maximum(u, jnp.finfo(p.dtype).tiny)
        cum = jnp.cumsum(p, axis=0)
        mi = jnp.sum(cum < u[None, :] * cum[-1:, :],
                     axis=0).astype(jnp.int32)
        mi = jnp.minimum(mi, 8)
        new_r = jnp.where(alive, pr + jnp.take(dr_tab, mi), r)
        new_c = jnp.where(alive, pc + jnp.take(dc_tab, mi), c)
        new_mem = jnp.concatenate([mem[1:], mi[None]], 0)
        new_mem = jnp.where(alive[None], new_mem, mem)
        oh_r = ((new_r[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, NROW), 1)) & alive[:, None]).astype(jnp.int8)
        oh_c = (new_c[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
        upd = jax.lax.dot_general(
            oh_r, oh_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (new_r, new_c, new_mem, key,
                pres.at[:NROW, :NCOL].add(upd), alive.astype(jnp.int32)), ()

    return step


def make_fused_step(blk, oh_bits, hist_mode='sublanes', xla_hist=False,
                    hist_src='new'):
    tabT = jnp.asarray(table_np).T.astype(jnp.float32)
    dirp_col = jnp.asarray(dirp_np)[:, None].astype(jnp.float32)

    def step(carry, base_flat):
        r, c, mem, key, pres, palive = carry
        alive, pr, pc = alive_push(r, c, mem)
        idx = pr * NCOL + pc
        base = base_flat.at[idx].get(mode='promise_in_bounds').T
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (N,), dtype=jnp.float32)
        new_r, new_c, new_mem, hist = fused_step_call(
            tabT, dirp_col, base, pr, pc, r, c,
            alive.astype(jnp.int32), palive, mem, u,
            nu=1., memory_k=K, grid_shape=(NROW, NCOL), blk=blk,
            oh_bits=oh_bits, hist_mode=hist_mode, hist_src=hist_src)
        if hist_mode != 'none':   # 'none' returns a tiny placeholder
            pres = pres + hist
        if xla_hist:
            oh_r = ((new_r[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NROW), 1)) & alive[:, None]
            ).astype(jnp.int8)
            oh_c = (new_c[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
            upd = jax.lax.dot_general(
                oh_r, oh_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            pres = pres.at[:NROW, :NCOL].add(upd)
        return (new_r, new_c, new_mem, key, pres,
                alive.astype(jnp.int32)), ()

    return step


def bench(name, step, base, unroll=1):
    @functools.partial(jax.jit, static_argnames=('length', 'unr'))
    def run(base, length: int, unr: int):
        r0 = jnp.full((N,), NROW // 2, jnp.int32)
        c0 = jnp.full((N,), NCOL // 2, jnp.int32)
        mem0 = jnp.full((max(K, 1), N), 4, jnp.int32)
        pres0 = jnp.zeros((NROW_P, NCOL_P), jnp.int32)
        carry = (r0, c0, mem0, jax.random.key(0), pres0,
                 jnp.ones((N,), jnp.int32))
        carry, _ = jax.lax.scan(lambda ca, _: step(ca, base), carry,
                                None, length=length, unroll=unr)
        r, c, mem, key, pres = carry[:5]
        return (jnp.sum(r) + jnp.sum(c) + jnp.sum(mem) + jnp.sum(pres) +
                jax.random.bits(key, (1,))[0].astype(jnp.int32))

    def go(length):
        np.asarray(run(base, length, unroll))

    t0 = time.perf_counter()
    go(S1); go(S2)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    print(f'{name:40s} {per*1e6:8.1f} us/step '
          f'{N/per/1e6:8.1f} M steps/s   (compile+warm {compile_t:.1f}s)',
          flush=True)


def main():
    rng_np = np.random.default_rng(1)
    base = jnp.asarray(rng_np.random((NROW * NCOL, 9), np.float32) + 0.1
                       ).astype(jnp.bfloat16)
    print(f'device: {jax.devices()[0]}  N={N} K={K} grid {NROW}x{NCOL}',
          flush=True)

    which = os.environ.get('FUSED_WHICH', 'all')
    if which in ('all', 'xla'):
        bench('XLA prod step (matmul presence) u8', make_xla_step(),
              base, unroll=8)
    if which in ('all', 'f8'):
        bench('fused int8 blk=1024', make_fused_step(1024, 8), base)
    if which in ('all', 'f16'):
        bench('fused bf16 blk=1024', make_fused_step(1024, 16), base)
    if which in ('all', 'decomp'):
        bench('fused NO hist (floor)',
              make_fused_step(1024, 8, hist_mode='none'), base)
        bench('fused no-hist + XLA hist outside',
              make_fused_step(1024, 8, hist_mode='none', xla_hist=True),
              base)
        bench('fused lanes-int8',
              make_fused_step(1024, 8, hist_mode='lanes'), base)
    if which in ('all', 'l16'):
        bench('fused lanes-int8 fold-alive',
              make_fused_step(1024, 8, hist_mode='lanes'), base)
        bench('fused lanes-int8 DELAYED hist',
              make_fused_step(1024, 8, hist_mode='lanes',
                              hist_src='cur'), base)
    if which in ('all', 'u4'):
        bench('fused delayed unroll=4',
              make_fused_step(1024, 8, hist_mode='lanes',
                              hist_src='cur'), base, unroll=4)
        bench('fused delayed unroll=8',
              make_fused_step(1024, 8, hist_mode='lanes',
                              hist_src='cur'), base, unroll=8)


if __name__ == '__main__':
    main()

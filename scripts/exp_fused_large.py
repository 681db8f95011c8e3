"""Fused-step hybrid at LARGE grids (round 4).

At grids whose padded histogram exceeds the fused kernel's VMEM budget
(_fused_fits == False, e.g. 2048x2048), the production step falls back
to pure XLA with a scatter-add presence. This measures whether running
the fused Pallas cascade/sampler with hist_mode='none' (tiny placeholder
output, round-4 change) plus the SAME XLA scatter outside the kernel
beats the pure-XLA step — i.e. whether the hybrid regime is worth
wiring into resolve_step_impl.

Timing: chained scan, marginal between two lengths, np.asarray sync
(block_until_ready lies on axon — CLAUDE.md).

Env: FL_N (default 98304), FL_K (memory 1), FL_GRID (default 2048x2048),
FL_WHICH (all|xla|hybrid|floor|xla_nohist).
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

from ssrs_tpu.agents.moves import (directional_probs, restriction_table)
from ssrs_tpu.agents import simulate as S

N = int(os.environ.get('FL_N', 98_304))
K = int(os.environ.get('FL_K', 1))
GRID = tuple(int(x) for x in
             os.environ.get('FL_GRID', '2048x2048').split('x'))
S1, S2 = 96, 224


def make_params(step_impl, presence_impl):
    return S.TrackParams(
        grid_shape=GRID, move_dirn=0., nu=1., memory_k=K,
        burnin=50, nsteps=10_000, weight_dtype='bfloat16',
        presence_impl=presence_impl, step_impl=step_impl)


def bench(name, params, base_flat, dirp, table, unroll=1):
    step = S.make_step_fn(params, base_flat, dirp, table)

    @functools.partial(jax.jit, static_argnames=('length', 'unr'))
    def run(base, length: int, unr: int):
        start = jnp.stack(
            [jnp.full((N,), GRID[0] // 2, jnp.int32),
             jnp.full((N,), GRID[1] // 2, jnp.int32)], axis=1)
        st = S.init_state(params, start, jax.random.key(0))
        st = st._replace(step=jnp.asarray(60, jnp.int32))  # past burnin
        st = jax.lax.scan(lambda ca, _: (step(ca), None), st,
                          None, length=length, unroll=unr)[0]
        return (jnp.sum(st.pos_r) + jnp.sum(st.pos_c) + jnp.sum(st.mem)
                + jnp.sum(st.presence)
                + jax.random.bits(st.key, (1,))[0].astype(jnp.int32))

    def go(length):
        np.asarray(run(base_flat, length, unroll))

    t0 = time.perf_counter()
    go(S1); go(S2)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    print(f'{name:44s} {per*1e6:8.1f} us/step '
          f'{N/per/1e6:8.1f} M steps/s   (compile+warm {compile_t:.1f}s)',
          flush=True)


def main():
    nrow, ncol = GRID
    rng_np = np.random.default_rng(1)
    base = jnp.asarray(rng_np.random((nrow * ncol, 9), np.float32) + 0.1
                       ).astype(jnp.bfloat16)
    dirp = jnp.asarray(directional_probs(0.))
    table = jnp.asarray(restriction_table())
    dev = jax.devices()[0]
    print(f'device: {dev}  N={N} K={K} grid {nrow}x{ncol} '
          f'fused_fits={S._fused_fits(make_params("auto", "auto"))}',
          flush=True)

    which = os.environ.get('FL_WHICH', 'all')
    if which in ('all', 'xla'):
        bench('XLA step + scatter presence (prod auto)',
              make_params('xla', 'scatter'), base, dirp, table, unroll=8)
    if which in ('all', 'xla_nohist'):
        bench('XLA step, NO presence (floor)',
              make_params('xla', 'none'), base, dirp, table, unroll=8)
    if which in ('all', 'hybrid'):
        bench('fused no-hist + XLA scatter (hybrid)',
              make_params('fused', 'scatter'), base, dirp, table)
    if which in ('all', 'floor'):
        bench('fused no-hist, NO presence (floor)',
              make_params('fused', 'none'), base, dirp, table)


if __name__ == '__main__':
    main()

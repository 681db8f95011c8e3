"""Measure the two presence-policy boundaries the round-5 engine
review flagged (both were heuristics, not measurements):

1. presence 'auto' picks the one-hot matmul while nrow+ncol <= 4096 —
   a ROW+COL criterion for a cost that scales with grid AREA x agents.
   At exactly 2048x2048 (sum 4096) auto picked the measured 2 ms/step
   dead end. Measure fused+matmul vs fused+scatter across areas to
   find the real crossover.

2. _fused_fits charges the kernel's one-hot block at 4 B/entry
   ("compares materialize i32") — if Mosaic really materializes the
   int8 one-hots instead, grids in the ~650^2..1100^2 band lose the
   in-kernel VMEM histogram unnecessarily. Force hist_mode='lanes'
   past the budget (monkeypatched _fused_fits) and see whether it
   compiles + beats the hybrid or VMEM-OOMs.

Timing: chained-scan marginal between two lengths (axon discipline).
Env: PB_N (98304), PB_WHICH (crossover|budget|all).
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

from ssrs_tpu.agents.moves import directional_probs, restriction_table
from ssrs_tpu.agents import simulate as S

N = int(os.environ.get('PB_N', 98_304))
S1, S2 = 96, 224


def bench(grid, step_impl, presence_impl, label):
    params = S.TrackParams(
        grid_shape=grid, move_dirn=0., nu=1., memory_k=1,
        burnin=50, nsteps=10_000, weight_dtype='bfloat16',
        presence_impl=presence_impl, step_impl=step_impl)
    rng_np = np.random.default_rng(1)
    base = jnp.asarray(
        rng_np.random((grid[0] * grid[1], 9), np.float32) + 0.1
    ).astype(jnp.bfloat16)
    dirp = jnp.asarray(directional_probs(0.))
    table = jnp.asarray(restriction_table())
    step = S.make_step_fn(params, base, dirp, table)

    @functools.partial(jax.jit, static_argnames=('length',))
    def run(b, length: int):
        start = jnp.stack(
            [jnp.full((N,), grid[0] // 2, jnp.int32),
             jnp.full((N,), grid[1] // 2, jnp.int32)], axis=1)
        st = S.init_state(params, start, jax.random.key(0))
        st = st._replace(step=jnp.asarray(60, jnp.int32))
        st = jax.lax.scan(lambda ca, _: (step(ca), None), st,
                          None, length=length)[0]
        return (jnp.sum(st.pos_r) + jnp.sum(st.presence)
                + jax.random.bits(st.key, (1,))[0].astype(jnp.int32))

    def go(length):
        np.asarray(run(base, length))

    go(S1)
    go(S2)
    t0 = time.perf_counter()
    go(S1)
    t_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    go(S2)
    t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    print(f'  {label:34s} {per * 1e6:8.1f} us/step', flush=True)
    return per


def main():
    which = os.environ.get('PB_WHICH', 'all')
    print(f'device: {jax.devices()[0]}  N={N}', flush=True)

    if which in ('all', 'crossover'):
        print('[crossover] ext presence: one-hot matmul vs scatter '
              '(fused hybrid step, marginal):', flush=True)
        for grid in ((1200, 1400), (1600, 1600), (1800, 1800),
                     (2000, 2000), (2048, 2048)):
            area = grid[0] * grid[1] / 1e6
            print(f' grid {grid[0]}x{grid[1]} (area {area:.2f}M, '
                  f'row+col {sum(grid)}):', flush=True)
            pm = bench(grid, 'fused', 'matmul', 'matmul')
            ps = bench(grid, 'fused', 'scatter', 'scatter')
            print(f'   -> matmul/scatter = {pm / ps:.2f}x', flush=True)

    if which in ('all', 'budget'):
        print('[budget] in-kernel VMEM histogram past the 4B-charged '
              'budget (forced) vs hybrid:', flush=True)
        real_fits = S._fused_fits
        for grid in ((800, 800), (1024, 1024), (1200, 1200)):
            print(f' grid {grid[0]}x{grid[1]} '
                  f'(fits today: {real_fits(S.TrackParams(grid_shape=grid, move_dirn=0., nu=1., memory_k=1, burnin=50, nsteps=100))}):',
                  flush=True)
            ph = bench(grid, 'fused', 'scatter', 'hybrid (today)')
            try:
                S._fused_fits = lambda p: True
                pk = bench(grid, 'fused', 'auto', 'in-kernel (forced)')
                print(f'   -> in-kernel/hybrid = {pk / ph:.2f}x',
                      flush=True)
            except Exception as exc:  # noqa: BLE001 — expect VMEM OOM
                print(f'   in-kernel FAILED: '
                      f'{type(exc).__name__}: {str(exc)[:200]}',
                      flush=True)
            finally:
                S._fused_fits = real_fits


if __name__ == '__main__':
    main()

"""Full-solve wall-clock probe (derived from exp_lap_scale) for the lap solver: per-V-cycle wall-clock vs grid size
(up to 16.8M cells) and per-GCR-iteration convergence rate on hard
fields. Separates 'cycles are slow' from 'too many cycles'. Also times
the full solve_potential_refined wall-clock (host build + device solve).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.simulator import _enable_compile_cache

_enable_compile_cache()

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import (_apply_lap, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    solve_potential_refined, vcycle,
                                    weight_planes)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=('num', 'ncycles'))
def run_cycles(cond, bmask, bvals, tiles, num: int, ncycles: int):
    """Build levels + run `ncycles` stationary deflated V-cycles,
    recording the scaled residual norm after each."""
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    u = jnp.where(bmask, jnp.asarray(bvals, jnp.float32), 500.)
    r = -_apply_lap(top.planes, u) * notb

    def norm(r):
        return jnp.linalg.norm(r * top.dinv)

    def body(carry, _):
        du, r = carry
        e = vcycle(levels, r, jnp.zeros_like(r))
        du = du + e * notb
        r = r - _apply_lap(top.planes, e * notb)
        r = r * notb
        return (du, r), norm(r)

    (du, r), norms = jax.lax.scan(body, (u * 0., r), None, length=ncycles)
    return norms


def probe(shape, ncycles=10):
    cond = hard_conductivity(shape)
    bmask, bvals = boundary_masks(0., shape)
    t0 = time.perf_counter()
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1:
        num *= 2
    tiles = build_tile_hierarchy(labels, bmask)
    t_host = time.perf_counter() - t0
    cj = jnp.asarray(cond)
    bj = jnp.asarray(bmask)
    vj = jnp.asarray(bvals, jnp.float32)

    def timed(nc):
        # np.asarray, NOT block_until_ready: the latter does not sync on
        # axon (CLAUDE.md); norms depends on every cycle, so its
        # materialization is a true barrier.
        np.asarray(run_cycles(cj, bj, vj, tiles, num, nc))
        t0 = time.perf_counter()
        norms = np.asarray(run_cycles(cj, bj, vj, tiles, num, nc))
        return time.perf_counter() - t0, norms

    t_a, norms = timed(ncycles)
    t_b, _ = timed(2 * ncycles)
    marginal = (t_b - t_a) / ncycles
    build = max(t_a - marginal * ncycles, 0.)
    n = np.asarray(norms)
    rates = n[1:] / np.maximum(n[:-1], 1e-30)
    print(f'{shape}  {shape[0]*shape[1]/1e6:6.2f}M cells  '
          f'{marginal*1e3:8.1f} ms/cycle marginal, build ~{build*1e3:7.1f}'
          f' ms, host prep {t_host*1e3:7.1f} ms'
          f'  rates {np.array2string(rates[:8], precision=2)}', flush=True)


def full_solve(shape):
    cond = hard_conductivity(shape)
    bmask, bvals = boundary_masks(0., shape)
    out, rrel = solve_potential_refined(cond, bmask, bvals)
    np.asarray(out)  # compile + run
    t0 = time.perf_counter()
    out, rrel = solve_potential_refined(cond, bmask, bvals)
    np.asarray(out)
    print(f'{shape}  full solve (warm) {time.perf_counter()-t0:7.2f} s  '
          f'rrel {float(rrel):.2e}', flush=True)


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    for shape in ((460, 460), (2048, 2048), (4096, 4096)):
        full_solve(shape)


if __name__ == '__main__':
    main()

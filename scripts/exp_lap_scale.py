"""Scaling probe for the lap solver: per-V-cycle wall-clock vs grid size
(up to 16.8M cells) and per-GCR-iteration convergence rate on hard
fields. Separates 'cycles are slow' from 'too many cycles'.
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
                                    island_labels, vcycle, weight_planes)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=('num', 'ncycles'))
def run_cycles(cond, bmask, bvals, labels, num: int, ncycles: int):
    """Build levels + run `ncycles` stationary deflated V-cycles,
    recording the scaled residual norm after each."""
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, labels=labels,
                              num_segments=num)
    top = levels[0]
    notb = top.notb
    rhs0 = jnp.where(bmask, jnp.asarray(bvals, jnp.float32), 0.)
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
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1:
        num *= 2
    cj = jnp.asarray(cond)
    bj = jnp.asarray(bmask)
    vj = jnp.asarray(bvals, jnp.float32)
    lj = jnp.asarray(labels)
    def timed(nc):
        norms = run_cycles(cj, bj, vj, lj, num, nc)
        norms.block_until_ready()
        t0 = time.perf_counter()
        norms = run_cycles(cj, bj, vj, lj, num, nc)
        norms.block_until_ready()
        return time.perf_counter() - t0, norms

    t_a, norms = timed(ncycles)
    t_b, _ = timed(2 * ncycles)
    marginal = (t_b - t_a) / ncycles
    build = max(t_a - marginal * ncycles, 0.)
    n = np.asarray(norms)
    rates = n[1:] / np.maximum(n[:-1], 1e-30)
    print(f'{shape}  {shape[0]*shape[1]/1e6:6.2f}M cells  '
          f'{marginal*1e3:8.1f} ms/cycle marginal, build ~{build*1e3:7.1f} ms'
          f'  rates {np.array2string(rates[:8], precision=2)}', flush=True)


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    for shape in ((460, 460), (1000, 1200), (2048, 2048), (4096, 4096)):
        probe(shape)


if __name__ == '__main__':
    main()

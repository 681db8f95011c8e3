"""Stationary deflated-V-cycle rates on a UNIFORM conductivity field at
several sizes: isolates the smooth-mode (plateau) convergence of the
pc-aggregation hierarchy from island effects."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.simulator import _enable_compile_cache

_enable_compile_cache()

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import (_apply_lap, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    vcycle, weight_planes)


@functools.partial(jax.jit, static_argnames=('num', 'ncycles'))
def run_cycles(cond, bmask, bvals, tiles, num: int, ncycles: int):
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
        r = (r - _apply_lap(top.planes, e * notb)) * notb
        return (du, r), norm(r)

    _, norms = jax.lax.scan(body, (u * 0., r), None, length=ncycles)
    return norms


def probe(shape):
    cond = np.ones(shape, np.float32)
    bmask, bvals = boundary_masks(0., shape)
    labels, k = island_labels(cond, bmask)
    num = 64
    tiles = build_tile_hierarchy(labels, bmask)
    norms = np.asarray(run_cycles(jnp.asarray(cond), jnp.asarray(bmask),
                                  jnp.asarray(bvals, np.float32), tiles,
                                  num, 16))
    rates = norms[1:] / np.maximum(norms[:-1], 1e-30)
    print(f'{shape}: rates {np.array2string(rates, precision=2)}',
          flush=True)


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    for shape in ((460, 460), (1024, 1024), (2048, 2048)):
        probe(shape)


if __name__ == '__main__':
    main()

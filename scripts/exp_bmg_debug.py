"""Bottom-up BoxMG cycle debugging: smooth field, no islands, 2 levels.

Isolates where vcycle_bmg diverges: smoother alone, two-grid cycle,
multilevel, then islands+deflation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (build_bmg_levels,
                                      build_tile_hierarchy_bmg,
                                      vcycle_bmg)
from ssrs_tpu.potential.lap import (_apply_lap, _smooth, apply_level,
                                    island_labels, weight_planes)


def smooth_cond(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 2 * np.pi, nrow)[:, None]
    x = np.linspace(0, 2 * np.pi, ncol)[None, :]
    w = 1.0 + 0.5 * np.sin(x) * np.cos(y) + 0.05 * rng.random(shape)
    return w.astype(np.float32)


def run_cycle(shape=(64, 80), dirn=225., nlev=None, ncyc=12,
              cond_fn=smooth_cond, seed=1, nu1=2, nu2=2, omega=0.85):
    cond = cond_fn(shape, seed=seed)
    bmask, _ = boundary_masks(dirn, shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    planes = weight_planes(cond)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    if nlev is not None:
        tiles = tiles[:nlev]
    levels, pws = build_bmg_levels(planes, jnp.asarray(bmask_np),
                                   tiles, num)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * levels[0].notb
    u = jnp.zeros(shape, jnp.float32)
    rates, rn_prev = [], None
    for i in range(ncyc):
        u = vcycle_bmg(levels, pws, rhs, u, omega=omega, nu1=nu1, nu2=nu2)
        rn = float(jnp.linalg.norm(
            (rhs - _apply_lap(planes, u)) * levels[0].notb
            * levels[0].dinv))
        if rn_prev:
            rates.append(rn / rn_prev)
        rn_prev = rn
    print(f'{shape} levels={len(levels)} islands={k} '
          f'rates={[round(x, 3) for x in rates[-6:]]}')
    return levels, pws


def smoother_only(shape=(32, 40), dirn=225.):
    """Jacobi alone must contract on every level's own operator."""
    cond = smooth_cond(shape)
    bmask, _ = boundary_masks(dirn, shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    planes = weight_planes(cond)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    levels, pws = build_bmg_levels(planes, jnp.asarray(bmask_np),
                                   tiles, 256)
    for li, lev in enumerate(levels):
        rng = np.random.default_rng(li)
        rhs = jnp.asarray((rng.random(lev.shape) - 0.5)
                          .astype(np.float32)) * lev.notb
        u = jnp.zeros(lev.shape, jnp.float32)
        rn_prev, rates = None, []
        for i in range(10):
            u = _smooth(lev, u, rhs, 0.85, 4)
            rn = float(jnp.linalg.norm(
                (rhs - apply_level(lev, u)) * lev.notb))
            if rn_prev:
                rates.append(rn / rn_prev)
            rn_prev = rn
        neg = float(jnp.sum(jnp.minimum(lev.planes, 0.)))
        print(f'  level {li} {lev.shape} smoother rates '
              f'{[round(x, 3) for x in rates[-3:]]} neg-W sum {neg:.3e}')


if __name__ == '__main__':
    print('--- smoother per level (smooth field) ---')
    smoother_only()
    print('--- two-grid, smooth field ---')
    run_cycle((64, 80), nlev=2)
    print('--- three-grid, smooth field ---')
    run_cycle((64, 80), nlev=3)
    print('--- full hierarchy, smooth field ---')
    run_cycle((64, 80))
    run_cycle((128, 160))

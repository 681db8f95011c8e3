"""Find the bmg NaN source at 256^2: per-level zaz sign, stationary
no-deflation contraction with per-level omega, then deflated cycle."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from scripts.exp_bmg_gcr import hard_conductivity
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (build_bmg_levels,
                                      build_tile_hierarchy_bmg, prolong_bmg,
                                      restrict_bmg, vcycle_bmg)
from ssrs_tpu.potential.lap import (_deflate, _smooth, apply_level,
                                    island_labels, weight_planes)

SHAPE = (256, 256)


def main():
    cond = hard_conductivity(SHAPE, seed=1)
    bmask, _ = boundary_masks(225., SHAPE)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes = weight_planes(cond)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    levels, pws = build_bmg_levels(planes, jnp.asarray(bmask_np), tiles, num)

    print(f'{SHAPE} islands={k} levels={len(levels)}')
    for i, (lev, ts) in enumerate(zip(levels, tiles)):
        zaz = 1.0 / np.asarray(lev.zaz_inv)
        active = np.asarray(ts.sisland)
        used = np.unique(active[active > 0])
        z = zaz[used] if len(used) else np.array([1.0])
        om = float(lev.omega)
        print(f'  level {i} {lev.shape}: omega={om:.3f} n_islands={len(used)}'
              f' zaz min={z.min():.3e} max={z.max():.3e} '
              f'neg={int((z <= 1e-29).sum())}')

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(SHAPE) - 0.5).astype(np.float32)) \
        * levels[0].notb

    # stationary, no deflation
    def cyc_nodefl(idx, u, rhs):
        level = levels[idx]
        if idx == len(levels) - 1:
            return _smooth(level, u, rhs, 0.85, 32)
        u = _smooth(level, u, rhs, 0.85, 2)
        r = (rhs - apply_level(level, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = restrict_bmg(r, pws[idx]) * coarse.notb
        e_c = cyc_nodefl(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + prolong_bmg(e_c, pws[idx], level.shape) * level.notb
        return _smooth(level, u, rhs, 0.85, 2)

    u = jnp.zeros_like(rhs)
    rn0 = float(jnp.linalg.norm(rhs))
    print('stationary no-deflation:')
    for it in range(12):
        u = cyc_nodefl(0, u, rhs)
        rn = float(jnp.linalg.norm((rhs - apply_level(levels[0], u))
                                   * levels[0].notb))
        print(f'  it {it}: r={rn:.3e} ratio={rn / rn0:.3f}')
        rn0 = rn

    # stationary, deflated
    u = jnp.zeros_like(rhs)
    rn0 = float(jnp.linalg.norm(rhs))
    print('stationary deflated (vcycle_bmg):')
    for it in range(12):
        u = vcycle_bmg(levels, pws, rhs, u)
        rn = float(jnp.linalg.norm((rhs - apply_level(levels[0], u))
                                   * levels[0].notb))
        print(f'  it {it}: r={rn:.3e} ratio={rn / rn0:.3f}')
        rn0 = rn
        if not np.isfinite(rn):
            break


if __name__ == '__main__':
    main()

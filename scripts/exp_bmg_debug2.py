"""Isolate the BoxMG island-field divergence.

Checks, on the hard speckle field:
1. cycle with deflation disabled everywhere (pure V) — diverges?
2. deflation only on the finest level.
3. coarse-level zaz values (bmg) vs dense z^T A_c z from dense RAP.
4. where the divergent mode lives (island cells vs plateau vs boundary).
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
                                      prolong_bmg, restrict_bmg)
from ssrs_tpu.potential.lap import (_apply_lap, _deflate, _smooth,
                                    apply_level, island_labels,
                                    weight_planes)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def vcycle_opt(levels, pws, rhs, u0, deflate_levels, omega=0.85,
               nu1=2, nu2=2, coarse_sweeps=32):
    def dfl(idx, level, u, rhs):
        return _deflate(level, u, rhs) if idx in deflate_levels else u

    def cycle(idx, u, rhs):
        level = levels[idx]
        if idx == len(levels) - 1:
            u = _smooth(level, u, rhs, omega, coarse_sweeps)
            return dfl(idx, level, u, rhs)
        u = _smooth(level, u, rhs, omega, nu1)
        u = dfl(idx, level, u, rhs)
        r = (rhs - apply_level(level, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = restrict_bmg(r, pws[idx]) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + prolong_bmg(e_c, pws[idx], level.shape) * level.notb
        u = dfl(idx, level, u, rhs)
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, u0, rhs)


def build(shape=(128, 160), dirn=225., seed=1):
    cond = hard_conductivity(shape, seed=seed)
    bmask, _ = boundary_masks(dirn, shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes = weight_planes(cond)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    levels, pws = build_bmg_levels(planes, jnp.asarray(bmask_np),
                                   tiles, num)
    return levels, pws, planes, labels, k, tiles


def rates(levels, pws, planes, deflate_levels, ncyc=15, label=''):
    shape = levels[0].shape
    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * levels[0].notb
    u = jnp.zeros(shape, jnp.float32)
    out, rn_prev = [], None
    for i in range(ncyc):
        u = vcycle_opt(levels, pws, rhs, u, deflate_levels)
        rn = float(jnp.linalg.norm(
            (rhs - _apply_lap(planes, u)) * levels[0].notb
            * levels[0].dinv))
        if rn_prev:
            out.append(rn / rn_prev)
        rn_prev = rn
    print(f'  {label:32s} rates={[round(x, 3) for x in out[-5:]]}')
    return u, rhs


def main():
    levels, pws, planes, labels, k, tiles = build()
    nL = len(levels)
    print(f'(128,160) islands={k} levels={nL}')
    for li, lev in enumerate(levels):
        zi = np.asarray(lev.zaz_inv)
        act = np.asarray(lev.sisland)
        used = np.unique(act[act > 0])
        z = 1.0 / zi[used] if used.size else np.array([])
        neg = float(jnp.sum(jnp.minimum(lev.planes, 0.)))
        s_info = ''
        if lev.s is not None:
            s_np = np.asarray(lev.s)
            s_info = f' s>0 cells={int((s_np > 0).sum())}'
        if z.size:
            print(f'  level {li} {lev.shape} islands={used.size} '
                  f'zaz[min,max]=[{z.min():.3e},{z.max():.3e}] '
                  f'negW={neg:.2e}{s_info}')
        else:
            print(f'  level {li} {lev.shape} islands=0 negW={neg:.2e}'
                  f'{s_info}')

    print('-- deflation ablation --')
    rates(levels, pws, planes, deflate_levels=set(), label='no deflation')
    rates(levels, pws, planes, deflate_levels={0}, label='finest only')
    rates(levels, pws, planes, deflate_levels={0, 1}, label='levels 0-1')
    u, rhs = rates(levels, pws, planes,
                   deflate_levels=set(range(nL)), label='all levels')

    # where does the error live after divergence?
    e = np.asarray(u)
    lab = np.asarray(labels)
    notb = np.asarray(levels[0].notb) > 0
    print('-- |u| after 15 cycles (diverged if huge) --')
    print(f'  max|u| overall {np.abs(e[notb]).max():.3e}; '
          f'on islands {np.abs(e[(lab > 0) & notb]).max():.3e}; '
          f'off islands {np.abs(e[(lab == 0) & notb]).max():.3e}')


if __name__ == '__main__':
    main()

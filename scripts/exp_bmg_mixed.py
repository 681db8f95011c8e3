"""f64 BUILD + f32 CYCLE: is the f32 failure in the build (probing/zaz
cancellation) or in the cycle apply itself?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import numpy as np

from scripts.exp_bmg_gcr import asym, gcr_rates, hard_conductivity
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (build_bmg_levels,
                                      build_tile_hierarchy_bmg, vcycle_bmg)
from ssrs_tpu.potential.lap import (LapLevel, island_labels, weight_planes)


def cast32(lev: LapLevel) -> LapLevel:
    c = lambda x: (x.astype(jnp.float32)
                   if x is not None and jnp.issubdtype(x.dtype, jnp.floating)
                   else x)
    return LapLevel(planes=c(lev.planes), notb=c(lev.notb),
                    dinv=c(lev.dinv), onehot=c(lev.onehot), sidx=lev.sidx,
                    sisland=lev.sisland, zaz_inv=c(lev.zaz_inv),
                    s=c(lev.s) if lev.s is not None else None,
                    omega=c(lev.omega))


def run(shape, seed=1, niter=40):
    cond = hard_conductivity(shape, seed=seed)
    bmask, _ = boundary_masks(225., shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes64 = weight_planes(cond).astype(jnp.float64)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    lev64, pws64 = build_bmg_levels(planes64, jnp.asarray(bmask_np), tiles,
                                    num)
    lev32 = [cast32(l) for l in lev64]
    pws32 = [p.astype(jnp.float32) for p in pws64]

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * lev32[0].notb

    rns = gcr_rates(lev32[0],
                    lambda r: vcycle_bmg(lev32, pws32, r,
                                         jnp.zeros_like(r)),
                    rhs, niter)
    print(f'{shape} islands={k}: f64-build/f32-cycle GCR '
          f'asym(last10)={asym(rns):.3f} rrel@{niter}={rns[-1] / rns[0]:.2e}')


if __name__ == '__main__':
    for n in (256, 512):
        run((n, n))


def run_finest_defl(shape, seed=1, niter=40):
    """f32 cycle, deflation at the finest level only (retest with the
    per-level omega fix in place)."""
    import jax
    from ssrs_tpu.potential.boxmg import prolong_bmg, restrict_bmg
    from ssrs_tpu.potential.lap import _deflate, _smooth, apply_level

    cond = hard_conductivity(shape, seed=seed)
    bmask, _ = boundary_masks(225., shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes64 = weight_planes(cond).astype(jnp.float64)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    lev64, pws64 = build_bmg_levels(planes64, jnp.asarray(bmask_np), tiles,
                                    num)
    levels = [cast32(l) for l in lev64]
    pws = [p.astype(jnp.float32) for p in pws64]

    def cycle(idx, u, rhs):
        level = levels[idx]
        defl = (lambda u: _deflate(level, u, rhs)) if idx == 0 \
            else (lambda u: u)
        if idx == len(levels) - 1:
            u = _smooth(level, u, rhs, 0.85, 32)
            return defl(u)
        u = _smooth(level, u, rhs, 0.85, 2)
        u = defl(u)
        r = (rhs - apply_level(level, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = restrict_bmg(r, pws[idx]) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + prolong_bmg(e_c, pws[idx], level.shape) * level.notb
        u = defl(u)
        return _smooth(level, u, rhs, 0.85, 2)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * levels[0].notb
    rns = gcr_rates(levels[0],
                    lambda r: cycle(0, jnp.zeros_like(r), r), rhs, niter)
    print(f'{shape} islands={k}: finest-only-defl f32 GCR '
          f'asym(last10)={asym(rns):.3f} rrel@{niter}={rns[-1] / rns[0]:.2e}')

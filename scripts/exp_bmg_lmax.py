"""Per-level Jacobi spectral radius on the raw-s BoxMG hierarchy.

The stationary deflated bmg cycle diverges at 256^2 in f64 with exact
(raw) Galerkin s. Smoothers measured stable on the CLIPPED-s build; this
measures lambda_max(D^-1 A) per level with raw_s=True — if
omega * lmax >= 2 anywhere, the smoother itself amplifies and per-level
omega is the fix.
"""

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

from scripts.exp_bmg_gcr import hard_conductivity
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import build_bmg_levels, build_tile_hierarchy_bmg
from ssrs_tpu.potential.lap import apply_level, island_labels, weight_planes

SHAPE = (256, 256)


def lmax_jacobi(level, iters=200, seed=0):
    """Power iteration on M = notb * dinv * A restricted to non-Dirichlet."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal(level.shape)) * level.notb

    @jax.jit
    def step(v):
        w = level.notb * level.dinv * apply_level(level, v)
        n = jnp.linalg.norm(w)
        return w / jnp.maximum(n, 1e-300), n

    lam = 0.0
    for _ in range(iters):
        v, lam = step(v)
    return float(lam)


def main():
    cond = hard_conductivity(SHAPE, seed=1)
    bmask, _ = boundary_masks(225., SHAPE)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes = weight_planes(cond).astype(jnp.float64)
    levels, pws = build_bmg_levels(
        planes, jnp.asarray(bmask_np),
        build_tile_hierarchy_bmg(labels, bmask_np), num, raw_s=True)
    print(f'{SHAPE} islands={k} levels={len(levels)}')
    for i, lev in enumerate(levels):
        lam = lmax_jacobi(lev)
        # also report negative-W mass and min diagonal
        wmin = float(jnp.min(lev.planes))
        negw = float(jnp.sum(jnp.where(lev.planes < 0, -lev.planes, 0.)))
        diag = jnp.sum(lev.planes, axis=0) + (lev.s if lev.s is not None
                                              else 0.)
        interior = (lev.notb > 0)
        dmin = float(jnp.min(jnp.where(interior, diag, jnp.inf)))
        smin = float(jnp.min(lev.s)) if lev.s is not None else 0.0
        print(f'  level {i} {lev.shape}: lmax(D^-1 A)={lam:.4f} '
              f'(0.85*lmax={0.85 * lam:.3f})  minW={wmin:.3e} '
              f'negW_mass={negw:.3e} min_diag={dmin:.3e} min_s={smin:.3e}')


if __name__ == '__main__':
    main()

"""f64 end-to-end bmg hierarchy with per-level omega: separates f32
scale-mixing (probing + apply noise swamping 1e-8 island physics) from
algorithmic failure. If f64 converges cleanly, the negative result is
'Galerkin stencil representation is f32-incompatible with the island
disease' — the exact disease lap.py's difference form was built to dodge."""

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
from ssrs_tpu.potential.lap import (apply_level, island_labels,
                                    weight_planes)

SHAPE = (256, 256)


def main():
    cond = hard_conductivity(SHAPE, seed=1)
    bmask, _ = boundary_masks(225., SHAPE)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes = weight_planes(cond).astype(jnp.float64)
    tiles = build_tile_hierarchy_bmg(labels, bmask_np)
    levels, pws = build_bmg_levels(planes, jnp.asarray(bmask_np), tiles, num)
    print(f'{SHAPE} islands={k} levels={len(levels)} '
          f'dtype={levels[0].planes.dtype}')
    for i, lev in enumerate(levels):
        zaz = 1.0 / np.asarray(lev.zaz_inv)
        print(f'  level {i} {lev.shape}: omega={float(lev.omega):.3f} '
          f'zaz_min={zaz[1:].min() if zaz.size > 1 else 1.0:.3e} '
          f'n_nonpos={(zaz[1:] <= 1e-29).sum()}')

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(SHAPE) - 0.5)) * levels[0].notb

    u = jnp.zeros_like(rhs)
    rn0 = float(jnp.linalg.norm(rhs))
    print('stationary deflated (f64):')
    for it in range(15):
        u = vcycle_bmg(levels, pws, rhs, u)
        rn = float(jnp.linalg.norm((rhs - apply_level(levels[0], u))
                                   * levels[0].notb))
        print(f'  it {it}: r={rn:.3e} ratio={rn / rn0:.3f}')
        rn0 = rn
        if not np.isfinite(rn):
            break

    rns = gcr_rates(levels[0],
                    lambda r: vcycle_bmg(levels, pws, r, jnp.zeros_like(r)),
                    rhs, 40)
    print(f'GCR f64: asym(last10)={asym(rns):.3f} '
          f'rrel@40={rns[-1] / rns[0]:.2e}')


if __name__ == '__main__':
    main()

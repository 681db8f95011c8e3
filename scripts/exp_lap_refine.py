"""Instrument the refined-solve stages at 2048^2: stage-1 GCR exit
state, then per-refinement-pass (rnorm, lev) trajectories and timing —
find out why the full solve runs long and exits above target.
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

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.ds import DS, ds_add, ds_from
from ssrs_tpu.potential.lap import (_apply_lap, _gcr_solve,
                                    _tile_broadcast, _tile_segsum,
                                    apply_lap_ds, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    island_sound_mask, weight_planes)

SHAPE = (2048, 2048)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=('num', 'npass'))
def staged(cond, bmask, bvals, tiles, sound, num: int, npass: int):
    bmask = jnp.asarray(bmask, bool)
    bvals = jnp.asarray(bvals, jnp.float32)
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    u0 = jnp.where(bmask, bvals, 500.)

    def scaled_norm(r_hi):
        return jnp.linalg.norm(r_hi * top.dinv)

    scale = scaled_norm(-_apply_lap(top.planes, u0) * notb) + 1e-30

    def island_coeff(r_hi):
        rsum = _tile_segsum(r_hi, top.lidx, top.slot_iota, top.sidx,
                            top.sisland, num,
                            top.ocell, top.oisland)
        return (rsum * top.zaz_inv * sound).at[0].set(0.)

    def island_correction(uds, r_hi):
        c = island_coeff(r_hi)
        upd = _tile_broadcast(c, top.lidx, top.slot_iota, top.sidx,
                              top.sisland, top.shape, top.ocell,
                              top.oisland)
        return ds_add(uds, ds_from(upd * notb))

    r0 = -_apply_lap(top.planes, u0) * notb
    du, rn1 = _gcr_solve(levels, r0, 60, 1e-7 * scale)
    u = u0 + du * notb
    uds = DS(u, jnp.zeros_like(u))

    def ds_resid(uds):
        r = apply_lap_ds(top.planes, uds)
        return -(r.hi + r.lo) * notb

    def body(uds, _):
        r_hi = ds_resid(uds)
        delta, inner_rn = _gcr_solve(levels, r_hi, 8,
                                     0.05 * scaled_norm(r_hi))
        uds = ds_add(uds, ds_from(delta * notb))
        r_hi = ds_resid(uds)
        uds = island_correction(uds, r_hi)
        r_hi = ds_resid(uds)
        lev = jnp.max(jnp.abs(island_coeff(r_hi)))
        return uds, (scaled_norm(r_hi) / scale, lev)

    uds, (rns, levs) = jax.lax.scan(body, uds, None, length=npass)
    return rn1 / scale, rns, levs


def main():
    print(f'device: {jax.devices()[0]}  shape={SHAPE}', flush=True)
    cond = hard_conductivity(SHAPE)
    bmask, bvals = boundary_masks(0., SHAPE)
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1:
        num *= 2
    tiles = build_tile_hierarchy(labels, bmask)
    cj, bj = jnp.asarray(cond), jnp.asarray(bmask)
    vj = jnp.asarray(bvals, jnp.float32)
    sound = jnp.asarray(island_sound_mask(labels, num))

    npass = 10
    rn1, rns, levs = staged(cj, bj, vj, tiles, sound, num, npass)
    rn1 = float(rn1)
    t0 = time.perf_counter()
    rn1_, rns, levs = staged(cj, bj, vj, tiles, sound, num, npass)
    rns = np.asarray(rns)
    dt = time.perf_counter() - t0
    levs = np.asarray(levs)
    print(f'stage-1 exit rrel: {rn1:.3e}; total warm {dt:.2f}s '
          f'for stage1 + {npass} passes', flush=True)
    for i, (a, b) in enumerate(zip(rns, levs)):
        print(f'pass {i:2d}  rrel {a:.3e}  lev {b:.3e}', flush=True)


if __name__ == '__main__':
    main()

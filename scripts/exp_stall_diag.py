"""Diagnose the 1200x1400@100m synthetic-terrain stall class found by
exp_stall_field_probe.py (round 5): 16/24 sweep directions exit above
1e-4, 8 above the 5e-3 fallback threshold — the largest stall family
seen since the round-3 east-strip fix.

Steps: rebuild one stalling field (SD_DIRN, default 210.4), dump
structure stats (cond>0 fraction, island census, strip-island count,
speckle density), then try solver levers: longer refine budget,
larger maxcycles, and report the residual trajectory shape (converging
slowly vs floored) by solving at increasing refine caps.

Env: SD_GRID (1200x1400), SD_RES (100), SD_DIRN (210.4).
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from ssrs_tpu.fields import (compute_orographic_updraft,
                                 get_above_threshold_speed)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.potential.lap import island_labels
    from ssrs_tpu.simulator import Simulator, _enable_compile_cache

    _enable_compile_cache()
    grid = os.environ.get('SD_GRID', '1200x1400')
    nrow, ncol = (int(v) for v in grid.split('x'))
    res = float(os.environ.get('SD_RES', 100.))
    dirn = float(os.environ.get('SD_DIRN', 210.4))

    out_dir = '/tmp/stall_diag_out'
    shutil.rmtree(out_dir, ignore_errors=True)
    sim = Simulator(
        run_name='diag', out_dir=out_dir, sim_mode='uniform',
        sim_seed=1, southwest_lonlat=(-106.21, 42.78),
        region_width_km=(ncol * res / 1000., nrow * res / 1000.),
        resolution=res, uniform_winddirn=270., uniform_windspeed=10.,
        track_direction=0., track_count=100,
        track_start_region=(1., ncol * res / 1000. - 1., 1., 2.),
        movement_model='fluidflow')
    slope = sim.get_terrain_slope().astype(np.float32)
    aspect = sim.get_terrain_aspect().astype(np.float32)
    speed = 10. * np.ones(sim.gridsize, np.float32)
    w = compute_orographic_updraft(
        jnp.asarray(speed),
        jnp.asarray(dirn * np.ones(sim.gridsize, np.float32)),
        jnp.asarray(slope), jnp.asarray(aspect))
    cond = np.asarray(get_above_threshold_speed(
        w, sim.updraft_threshold), np.float32)
    np.save('/tmp/stall_field.npy', cond)
    bmask, bvals = boundary_masks(0., tuple(sim.gridsize))
    bmask_np = np.asarray(bmask, bool)

    pos = cond > 0
    labels, k = island_labels(cond, bmask_np)
    sizes = np.bincount(labels.ravel())[1:]
    strip = np.unique(labels[:, -2:])
    strip = strip[strip > 0]
    print(f'grid {nrow}x{ncol}, cond>0 fraction {pos.mean():.3f}', flush=True)
    print(f'floating islands: {k}; sizes min/med/max = '
          f'{sizes.min() if k else 0}/'
          f'{int(np.median(sizes)) if k else 0}/'
          f'{sizes.max() if k else 0}; '
          f'1-cell islands: {(sizes == 1).sum() if k else 0}', flush=True)
    print(f'strip islands (touch 2 east cols): {len(strip)}', flush=True)

    for refine, maxc in ((30, 60), (60, 60), (120, 60), (30, 120)):
        pot, rrel = solve_potential_refined(
            cond, bmask, bvals, maxcycles=maxc, refine=refine)
        print(f'refine={refine} maxcycles={maxc}: rrel={float(rrel):.3e}',
              flush=True)


if __name__ == '__main__':
    main()

"""Probe the bench_sweep_e2e 1200x1400@100m stall: which direction's
synthetic field stalls the refined solver, and does the result depend
on whether the conductivity arrives as a HOST array (round-4 flow) or
a DEVICE array (round-5 fields_device flow)? Identical rrels = the
stall is field-specific and pre-existing, not a device-path
regression.

Env: SF_GRID (1200x1400), SF_DIRNS (24), SF_RES (100).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.simulator import Simulator, _enable_compile_cache
    import shutil

    _enable_compile_cache()
    grid = os.environ.get('SF_GRID', '1200x1400')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_dirns = int(os.environ.get('SF_DIRNS', 24))
    res = float(os.environ.get('SF_RES', 100.))
    dirns = np.linspace(180., 320., n_dirns)

    # reproduce bench_sweep_e2e's terrain exactly: same Simulator ctor
    out_dir = '/tmp/stall_probe_out'
    shutil.rmtree(out_dir, ignore_errors=True)
    sim = Simulator(
        run_name='probe', out_dir=out_dir, sim_mode='uniform',
        sim_seed=1, southwest_lonlat=(-106.21, 42.78),
        region_width_km=(ncol * res / 1000., nrow * res / 1000.),
        resolution=res, uniform_winddirn=270., uniform_windspeed=10.,
        track_direction=0., track_count=100,
        track_start_region=(1., ncol * res / 1000. - 1., 1., 2.),
        movement_model='fluidflow')
    slope = sim.get_terrain_slope().astype(np.float32)
    aspect = sim.get_terrain_aspect().astype(np.float32)
    speed = 10. * np.ones(sim.gridsize, np.float32)
    bmask, bvals = boundary_masks(0., tuple(sim.gridsize))

    from ssrs_tpu.fields import compute_orographic_updraft
    for d in dirns:
        w = compute_orographic_updraft(
            jnp.asarray(speed),
            jnp.asarray(d * np.ones(sim.gridsize, np.float32)),
            jnp.asarray(slope), jnp.asarray(aspect))
        cond_dev = get_above_threshold_speed(w, sim.updraft_threshold)
        cond_host = np.asarray(cond_dev, np.float32)
        _, rr_host = solve_potential_refined(cond_host, bmask, bvals)
        rr_host = float(rr_host)
        flag = ''
        rr_dev = None
        if rr_host > 1e-4:
            _, rr_dev = solve_potential_refined(jnp.asarray(cond_host),
                                                bmask, bvals)
            rr_dev = float(rr_dev)
            flag = '  <-- HIGH (dev-input rrel '
            flag += f'{rr_dev:.3e}, match={rr_dev == rr_host})'
        print(f'dirn {d:6.1f}: rrel_host={rr_host:.3e}{flag}',
              flush=True)


if __name__ == '__main__':
    main()

"""TPU timing of the reference-exact potential solver (potential/lap.py)
after the on-device hierarchy-build refactor: warm-solve wall-clock and
the host/device split, vs the legacy row-normalized multigrid, on the
bench conductivity (500x600) and synthetic hard fields at larger sizes.
"""

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

from bench import synthetic_dem
from ssrs_tpu.fields import (get_above_threshold_speed,
                             orographic_updraft_from_dem)
from ssrs_tpu.potential import solve_potential_mg, solve_potential_refined
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import island_labels


def bench_conductivity(nrow=500, ncol=600, res=100.0):
    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
    speeds = 10. * jnp.ones((nrow, ncol), jnp.float32)
    w = orographic_updraft_from_dem(dem, res, speeds,
                                    270. * jnp.ones_like(speeds))
    return np.asarray(get_above_threshold_speed(w, 0.75))


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def time_refined(cond, dirn=0., reps=3):
    shape = cond.shape
    bmask, bvals = boundary_masks(dirn, shape)
    t0 = time.perf_counter()
    labels, k = island_labels(cond, bmask)
    t_label = time.perf_counter() - t0
    # compile + first run
    pot, rrel = solve_potential_refined(cond, bmask, bvals)
    pot.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        pot, rrel = solve_potential_refined(cond, bmask, bvals)
        pot.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f'  lap refined {shape}: warm {dt:6.3f} s/solve '
          f'(host label {t_label:5.3f} s, {k} islands, rrel {float(rrel):.2e})',
          flush=True)
    return dt


def time_mg(cond, dirn=0., reps=3):
    shape = cond.shape
    bmask, bvals = boundary_masks(dirn, shape)
    pot, rn = solve_potential_mg(cond, jnp.asarray(bmask),
                                 jnp.asarray(bvals))
    pot.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        pot, rn = solve_potential_mg(cond, jnp.asarray(bmask),
                                     jnp.asarray(bvals))
        pot.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f'  legacy mg   {shape}: warm {dt:6.3f} s/solve', flush=True)
    return dt


def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    print('bench conductivity 500x600:', flush=True)
    cond = bench_conductivity()
    time_refined(cond)
    time_mg(jnp.asarray(cond))
    for shape in ((460, 460), (1000, 1200)):
        print(f'hard field {shape}:', flush=True)
        time_refined(hard_conductivity(shape))


if __name__ == '__main__':
    main()

"""Experiment: difference-form DS-refined solver vs the f64 oracle on
hard (thresholded-updraft-like) conductivity fields. Run on CPU:
JAX_PLATFORMS=cpu python scripts/exp_lap.py [nrow ncol]
"""
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import numpy as np

jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

from ssrs_tpu.potential import solve_potential_direct
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import solve_potential_refined


def conductivity_hard(shape, seed=0):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def main():
    shape = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (24, 30)
    for dirn in (0., 45., 90.):
        cond = conductivity_hard(shape, seed=1)
        bmask, bvals = boundary_masks(dirn, shape)
        t0 = time.time()
        want = solve_potential_direct(cond, dirn).astype(np.float64)
        t_direct = time.time() - t0
        t0 = time.time()
        got, rrel = solve_potential_refined(cond, bmask, bvals)
        got = np.asarray(got, np.float64)
        t_dev = time.time() - t0
        err = np.abs(got - want)
        print(f'{shape} dirn={dirn:5.1f}  max|err|={err.max():9.3e}  '
              f'rel={err.max() / 1000:9.3e}  rrel={float(rrel):8.2e}  '
              f'direct {t_direct:6.2f}s  device {t_dev:6.2f}s')


if __name__ == '__main__':
    main()

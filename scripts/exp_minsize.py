"""Hierarchy depth vs full warm-solve time.

The 4096² V-cycle profile (exp_deflate2 + jax.profiler) shows ~9 ms of
its 50 ms inside the coarsest-level fori_loops (32 Jacobi sweeps of
~35 tiny ops each at the op-dispatch floor) and a long tail of small
mid-level ops — the hierarchy runs to 4x4 (11 levels at 4096²).
Truncating at min_size trades per-cycle op count against convergence
rate; the honest metric is the full production warm solve.

Usage: python scripts/exp_minsize.py [n ...]
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

import ssrs_tpu.potential.lap as L
from ssrs_tpu.potential.boundary import boundary_masks


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def main(sizes):
    print(f'device {jax.devices()[0]}', flush=True)
    for n in sizes:
        shape = (n, n)
        cond = hard_conductivity(shape)
        bmask, bvals = boundary_masks(0., shape)
        labels, k = L.island_labels(cond, np.asarray(bmask))
        num = 256
        while num < k + 1:
            num *= 4
        sound = jnp.asarray(L.island_sound_mask(labels, num))
        for min_size in (4, 16, 64, 128, 256):
            tiles = L.build_tile_hierarchy(labels, np.asarray(bmask),
                                           min_size=min_size)
            args = (jnp.asarray(cond), jnp.asarray(bmask),
                    jnp.asarray(bvals, jnp.float32))
            out, rrel = L._solve_refined_jit(*args, tiles, sound, num,
                                             1e-7, 60, 30)
            np.asarray(out)  # compile + first solve
            t0 = time.perf_counter()
            out, rrel = L._solve_refined_jit(*args, tiles, sound, num,
                                             1e-7, 60, 30)
            out = np.asarray(out)
            dt = time.perf_counter() - t0
            print(f'n={n} min_size={min_size:4d} levels={len(tiles):2d} '
                  f'warm {dt:7.2f} s  rrel {float(rrel):.2e}', flush=True)


if __name__ == '__main__':
    main([int(a) for a in sys.argv[1:]] or [2048])

"""Does weak-plateau deflation cure the round-5 plateau stall class?

exp_stall_localize.py showed the 1200x1400@100m synthetic-terrain
stalls (8/24 sweep directions above the 5e-3 fallback threshold) carry
100% of their stuck residual mass on PLATEAU cells (cond=0, label 0)
— plateau near-null modes, not the round-3 east-strip class. Round 3
measured weak-plateau deflation (island_labels(weak=True)) as a RATE
negative at 460^2 (0.846 -> 0.924 asymptotic GCR); this probes whether
it is a ROBUSTNESS fix at the scale where the plateau modes stall the
solve outright.

Solves /tmp/stall_field.npy (run exp_stall_diag.py first) both ways
and reports rrel + wall; then sweeps all 24 directions' fields if
WD_SWEEP=1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def solve_with_weak(cond, bmask, bvals, weak, maxcycles=60):
    import jax.numpy as jnp
    from ssrs_tpu.potential.lap import (_solve_refined_jit,
                                        build_tile_hierarchy,
                                        island_labels,
                                        island_sound_mask)
    bmask_np = np.asarray(bmask, bool)
    labels_np, k = island_labels(cond, bmask_np, weak=weak)
    num = 256
    while num < k + 1:
        num *= 4
    tiles = build_tile_hierarchy(labels_np, bmask_np)
    return _solve_refined_jit(
        jnp.asarray(cond, jnp.float32), jnp.asarray(bmask_np),
        jnp.asarray(bvals, jnp.float32), tiles,
        jnp.asarray(island_sound_mask(labels_np, num)), num,
        1e-7, maxcycles, 30)


def main():
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.simulator import _enable_compile_cache

    _enable_compile_cache()
    cond = np.load('/tmp/stall_field.npy')
    nrow, ncol = cond.shape
    bmask, bvals = boundary_masks(0., (nrow, ncol))

    for weak in (False, True):
        t0 = time.perf_counter()
        pot, rrel = solve_with_weak(cond, bmask, bvals, weak)
        rrel = float(rrel)
        wall = time.perf_counter() - t0
        print(f'weak={weak}: rrel={rrel:.3e} wall={wall:.1f}s '
              f'(incl. compile on first call)', flush=True)
        t0 = time.perf_counter()
        pot, rrel = solve_with_weak(cond, bmask, bvals, weak)
        print(f'  warm: rrel={float(rrel):.3e} '
              f'wall={time.perf_counter() - t0:.1f}s', flush=True)


if __name__ == '__main__':
    main()

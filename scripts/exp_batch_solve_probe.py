"""Probe: where does the multi-case potential prep wall actually sit?

Splits the per-case prep into (a) host tile/label work incl. the
device_put tunnel trip and (b) pure device solve time when all hosts
structures are prebuilt and C solves are enqueued back-to-back with one
residual read each at the end. If (b) dominates the pipelined wall,
a vmapped batched solve (one program advancing C cases) has headroom;
if (a) dominates, batching buys nothing and host-side work is the lever.

Env: BP_CASES (default 8), BP_GRID (default 500x600), BP_REPS (3).
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import synthetic_dem
    import jax
    import jax.numpy as jnp
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.simulator import Simulator, _enable_compile_cache
    from ssrs_tpu.potential.lap import (
        _solve_refined_jit, build_tile_hierarchy, island_labels,
        island_sound_mask)
    from ssrs_tpu.potential.boundary import boundary_masks

    _enable_compile_cache()
    grid = os.environ.get('BP_GRID', '500x600')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_cases = int(os.environ.get('BP_CASES', 8))
    reps = int(os.environ.get('BP_REPS', 3))

    dem = synthetic_dem(nrow, ncol, 100.)
    conds = []
    for i in range(n_cases):
        rng = np.random.default_rng(i)
        s = (8. + 4. * rng.random((nrow, ncol))).astype(np.float32)
        d = (200. + 140. * rng.random((nrow, ncol))).astype(np.float32)
        w = orographic_updraft_from_dem(jnp.asarray(dem), 100.,
                                        jnp.asarray(s), jnp.asarray(d))
        conds.append(np.asarray(get_above_threshold_speed(w, 0.75)))

    bmask, bvals = boundary_masks(0., (nrow, ncol))
    bmask_np = np.asarray(bmask, bool)

    def host_prep(c):
        labels_np, k = island_labels(np.asarray(c), bmask_np)
        num = 256
        while num < k + 1:
            num *= 4
        tiles = build_tile_hierarchy(labels_np, bmask_np)
        sound = jnp.asarray(island_sound_mask(labels_np, num))
        return tiles, sound, num

    # ---- warm all compiles (every island-bucket this set hits)
    prepped = []
    for c in conds:
        tiles, sound, num = host_prep(c)
        prepped.append((jnp.asarray(c, jnp.float32), tiles, sound, num))
    for c, tiles, sound, num in prepped:
        pot, resid = _solve_refined_jit(c, jnp.asarray(bmask_np),
                                        jnp.asarray(bvals, jnp.float32),
                                        tiles, sound, num, 1e-7, 60, 30)
        float(resid)
    print(f'num buckets: {sorted({p[3] for p in prepped})}', flush=True)

    # warm the batched executable too
    from ssrs_tpu.potential.lap import solve_potential_refined_batch
    pots, resids = solve_potential_refined_batch(
        conds, bmask_np, bvals)
    np.asarray(pots)
    print(f'batched warm resids: {np.asarray(resids)}', flush=True)

    results = {'host': [], 'dev_serial': [], 'dev_one': [],
               'batched': []}
    for rep in range(reps):
        # (a) host prep wall, all cases serial (what the pipeline hides)
        t0 = time.perf_counter()
        prepped = []
        for c in conds:
            tiles, sound, num = host_prep(c)
            prepped.append((jnp.asarray(c, jnp.float32), tiles, sound,
                            num))
        results['host'].append(time.perf_counter() - t0)

        # (b) device-serial: enqueue all solves, then read residuals
        t0 = time.perf_counter()
        outs = []
        for c, tiles, sound, num in prepped:
            outs.append(_solve_refined_jit(
                c, jnp.asarray(bmask_np),
                jnp.asarray(bvals, jnp.float32),
                tiles, sound, num, 1e-7, 60, 30))
        for pot, resid in outs:
            float(resid)
            np.asarray(pot)
        results['dev_serial'].append(time.perf_counter() - t0)

        # (c) one solve, synchronous
        c, tiles, sound, num = prepped[0]
        t0 = time.perf_counter()
        pot, resid = _solve_refined_jit(
            c, jnp.asarray(bmask_np), jnp.asarray(bvals, jnp.float32),
            tiles, sound, num, 1e-7, 60, 30)
        float(resid)
        np.asarray(pot)
        results['dev_one'].append(time.perf_counter() - t0)

        # (d) batched: host prep + ONE vmapped program for all C cases
        t0 = time.perf_counter()
        pots, resids = solve_potential_refined_batch(
            conds, bmask_np, bvals)
        np.asarray(resids)
        np.asarray(pots)
        results['batched'].append(time.perf_counter() - t0)
        print(f'rep {rep}: host={results["host"][-1]:.2f}s '
              f'dev_serial={results["dev_serial"][-1]:.2f}s '
              f'dev_one={results["dev_one"][-1]:.3f}s '
              f'batched={results["batched"][-1]:.2f}s', flush=True)

    print(f'cases={n_cases} grid={nrow}x{ncol}')
    for k, v in results.items():
        print(f'{k}: min={min(v):.2f}s med={sorted(v)[len(v)//2]:.2f}s')


if __name__ == '__main__':
    main()

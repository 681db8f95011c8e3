"""Where does batched potential solving stop winning? (round 5)

The batched vmapped refined solve was measured ~3x faster than
back-to-back solves at 500x600 (latency-bound small-grid regime,
exp_batch_solve_probe.py), so Config.potential_batch auto chose groups
of 8 for anything under ~2M cells on a MEMORY envelope alone. The
round-5 Appalachian end-to-end run (bench_seasonal.py, 1200x1400 =
1.68M cells) showed batched prep LOSING 1.45x to sequential solves —
one solve at that size already fills the chip, and vmapping 8 pads
every case's island hierarchy to the batch maxima.

This sweep times groups of {1, 2, 4, 8} across grid sizes to locate
the throughput crossover that should size the auto cap (memory cap
stays as a second bound). Each (grid, group) is warmed then timed on
the SAME solves, interleaved A/B within one process/window.

Env: BC_GRIDS (default '500x600,800x900,1200x1400'), BC_CASES (8),
BC_REPS (2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import synthetic_dem
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import (solve_potential_refined,
                                    solve_potential_refined_batch)
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.simulator import _enable_compile_cache
    _enable_compile_cache()

    grids = os.environ.get('BC_GRIDS',
                           '500x600,800x900,1200x1400').split(',')
    n_cases = int(os.environ.get('BC_CASES', 8))
    reps = int(os.environ.get('BC_REPS', 2))
    out = {}

    for gspec in grids:
        nrow, ncol = (int(v) for v in gspec.split('x'))
        dem = jnp.asarray(synthetic_dem(nrow, ncol, 100.))
        rng = np.random.default_rng(3)
        conds = []
        for i in range(n_cases):
            s = (8. + 4. * rng.random((nrow, ncol))).astype(np.float32)
            d = (200. + 140. * rng.random((nrow, ncol))).astype(
                np.float32)
            w = orographic_updraft_from_dem(dem, 100., jnp.asarray(s),
                                            jnp.asarray(d))
            conds.append(np.asarray(get_above_threshold_speed(w, 0.75)))
        bmask, bvals = boundary_masks(0., (nrow, ncol))

        def run(group):
            if group == 1:
                pots = [solve_potential_refined(c, bmask, bvals)[0]
                        for c in conds]
                return [np.asarray(p) for p in pots]
            outs = []
            for i0 in range(0, n_cases, group):
                p, _ = solve_potential_refined_batch(
                    conds[i0:i0 + group], bmask, bvals)
                outs.append(p)
            return [np.asarray(p) for ch in outs for p in ch]

        res = {}
        for group in (1, 2, 4, 8):
            run(group)  # compile + warm
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(group)
                walls.append(time.perf_counter() - t0)
            res[group] = round(min(walls), 2)
            print(f'{gspec} group={group}: {res[group]}s '
                  f'(all {walls})', flush=True)
        out[gspec] = res

    print(json.dumps({'metric': 'batch_crossover', 'cases': n_cases,
                      'best_group': {g: min(r, key=r.get)
                                     for g, r in out.items()},
                      'walls_s': out}))


if __name__ == '__main__':
    main()

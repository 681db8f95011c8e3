"""Warm-starting sequential direction-sweep potential solves.

A direction sweep solves one potential per wind direction; adjacent
directions (6 deg apart on the 24-case Appalachian flagship) produce
similar conductivity fields, so the previous direction's potential is
a candidate initial iterate. ``solve_potential_refined(init=...)``
accepts an UNMATERIALIZED device array, so the warm chain adds no host
syncs — solve i's output feeds solve i+1's dispatch directly.
Convergence is judged against the cold start's residual either way
(lap.py), so rrel/fallback semantics are identical.

Measures, interleaved in one window: cold chain (init=None per case)
vs warm chain (case 0 cold, case i init=pot_{i-1}); per-chain wall,
per-case rrel, and max|warm-cold| disagreement.

Env: WS_GRID (default 1200x1400), WS_CASES (24), WS_REPS (2),
WS_SPAN (default '180:320' degrees).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import synthetic_dem
    import jax.numpy as jnp
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.simulator import _enable_compile_cache

    _enable_compile_cache()
    grid = os.environ.get('WS_GRID', '1200x1400')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_cases = int(os.environ.get('WS_CASES', 24))
    reps = int(os.environ.get('WS_REPS', 2))
    lo, hi = (float(v) for v in
              os.environ.get('WS_SPAN', '180:320').split(':'))
    res = 50. if max(nrow, ncol) >= 1000 else 100.

    dem = synthetic_dem(nrow, ncol, res)
    speed = 10. * np.ones((nrow, ncol), np.float32)
    conds = []
    for d in np.linspace(lo, hi, n_cases):
        w = orographic_updraft_from_dem(
            jnp.asarray(dem), res, jnp.asarray(speed),
            jnp.asarray(d * np.ones((nrow, ncol), np.float32)))
        conds.append(np.asarray(get_above_threshold_speed(w, 0.75),
                                np.float32))
    bmask, bvals = boundary_masks(0., (nrow, ncol))

    def chain(warm: bool):
        t0 = time.perf_counter()
        pots, rrels = [], []
        prev = None
        for c in conds:
            pot, rrel = solve_potential_refined(
                c, bmask, bvals, init=prev if warm else None)
            pots.append(pot)
            rrels.append(rrel)
            prev = pot
        rr = [float(r) for r in rrels]     # blocks on every solve
        np.asarray(pots[-1])
        return time.perf_counter() - t0, rr, pots

    # warm-up: compile both executables (init absent/present are two
    # programs) outside the clock
    chain(False)
    chain(True)

    out = {'bench': 'warmstart_solve', 'grid': grid, 'cases': n_cases,
           'cold_wall_s': [], 'warm_wall_s': []}
    for rep in range(reps):
        wall_c, rr_c, pots_c = chain(False)
        wall_w, rr_w, pots_w = chain(True)
        dmax = max(float(np.abs(np.asarray(a, np.float64)
                                - np.asarray(b, np.float64)).max())
                   for a, b in zip(pots_c, pots_w))
        print(f'rep {rep}: cold={wall_c:.2f}s warm={wall_w:.2f}s  '
              f'max rrel cold={max(rr_c):.2e} warm={max(rr_w):.2e}  '
              f'max|warm-cold|={dmax:.3g}', flush=True)
        out['cold_wall_s'].append(round(wall_c, 2))
        out['warm_wall_s'].append(round(wall_w, 2))
        out['max_rrel_cold'] = f'{max(rr_c):.2e}'
        out['max_rrel_warm'] = f'{max(rr_w):.2e}'
        out['max_disagreement'] = f'{dmax:.3g}'
    out['speedup'] = round(min(out['cold_wall_s'])
                           / min(out['warm_wall_s']), 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

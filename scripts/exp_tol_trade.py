"""Measure the Config.potential_tol speed/accuracy trade on sweep-
shaped solves (round 5: the knob now actually reaches the refined
solver — it was silently ignored before).

For each tol tier, run the 24-direction solve chain (same fields as
exp_warmstart_solve.py) and record: chain wall, per-case exit rrel,
and max|pot - pot_ref| vs the tol=1e-7 baseline (potential units out
of 1000; for context, the bf16 weight-table quantization the presence
statistics demonstrably absorb is ~0.4% ~ 4 units).

Interleaved tiers within one window. Env: TT_GRID (1200x1400),
TT_CASES (24), TT_TOLS ('1e-7,1e-5,1e-4'), TT_REPS (2).
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
    grid = os.environ.get('TT_GRID', '1200x1400')
    nrow, ncol = (int(v) for v in grid.split('x'))
    n_cases = int(os.environ.get('TT_CASES', 24))
    tols = [float(t) for t in
            os.environ.get('TT_TOLS', '1e-7,1e-5,1e-4').split(',')]
    reps = int(os.environ.get('TT_REPS', 2))
    res = 50. if max(nrow, ncol) >= 1000 else 100.

    dem = synthetic_dem(nrow, ncol, res)
    speed = 10. * np.ones((nrow, ncol), np.float32)
    conds = []
    for d in np.linspace(180., 320., n_cases):
        w = orographic_updraft_from_dem(
            jnp.asarray(dem), res, jnp.asarray(speed),
            jnp.asarray(d * np.ones((nrow, ncol), np.float32)))
        conds.append(np.asarray(get_above_threshold_speed(w, 0.75),
                                np.float32))
    bmask, bvals = boundary_masks(0., (nrow, ncol))

    def chain(tol):
        t0 = time.perf_counter()
        pots, rrels = [], []
        for c in conds:
            pot, rrel = solve_potential_refined(c, bmask, bvals,
                                                tol=tol)
            pots.append(pot)
            rrels.append(rrel)
        rr = [float(r) for r in rrels]
        np.asarray(pots[-1])
        return time.perf_counter() - t0, rr, pots

    for tol in tols:        # compile warm-up per tol executable
        chain(tol)

    walls = {tol: [] for tol in tols}
    base_pots = None
    out = {'bench': 'tol_trade', 'grid': grid, 'cases': n_cases,
           'tiers': {}}
    for rep in range(reps):
        for tol in tols:
            wall, rr, pots = chain(tol)
            walls[tol].append(wall)
            tier = out['tiers'].setdefault(
                f'{tol:g}', {'wall_s': [], 'max_rrel': None,
                             'max_dpot': None})
            tier['wall_s'].append(round(wall, 2))
            tier['max_rrel'] = f'{max(rr):.2e}'
            if tol == tols[0]:
                base_pots = pots
            else:
                dmax = max(float(np.abs(
                    np.asarray(a, np.float64) - np.asarray(b, np.float64)
                ).max()) for a, b in zip(base_pots, pots))
                tier['max_dpot'] = round(dmax, 3)
            print(f'rep {rep} tol={tol:g}: wall={wall:.2f}s '
                  f'max rrel={max(rr):.2e} '
                  f'dpot={tier["max_dpot"]}', flush=True)
    for tol in tols[1:]:
        out['tiers'][f'{tol:g}']['speedup_vs_base'] = round(
            min(walls[tols[0]]) / min(walls[tol]), 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

"""Oracle check for the plateau-stall class: f64 direct solve of
/tmp/stall_field.npy (~90 s, ~7 GB at 1.68M unknowns), then error
distributions of (a) the stalled plain refined solve (rrel 8.7e-3)
and (b) the weak-plateau-deflation retry (rrel 1.2e-3), split into
movement-relevant cells (cond>0 — the only cells whose potential the
fluidflow weights ever read: a move weight is harmonic(cond_i, cond_j)
x potential drop, zero unless BOTH endpoints have cond>0) vs plateau
cells (movement-inert).

Decides the round-5 stall policy: if the weak retry's cond>0 error is
oracle-clean, a stall-aware weak retry replaces the 87 s f64 fallback
for this class.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))


def main():
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.potential.direct import solve_potential_direct
    from ssrs_tpu.simulator import _enable_compile_cache
    from exp_weak_deflation import solve_with_weak

    _enable_compile_cache()
    cond = np.load('/tmp/stall_field.npy')
    nrow, ncol = cond.shape
    bmask, bvals = boundary_masks(0., (nrow, ncol))
    bmask_np = np.asarray(bmask, bool)

    t0 = time.time()
    oracle = solve_potential_direct(cond, 0.).astype(np.float64)
    print(f'f64 direct solve took {time.time() - t0:.0f}s', flush=True)

    pot_plain, rr_plain = solve_potential_refined(cond, bmask, bvals)
    pot_weak, rr_weak = solve_with_weak(cond, bmask, bvals, True)

    strong = (cond > 0) & ~bmask_np
    plateau = (cond <= 0) & ~bmask_np

    def report(name, pot, rrel):
        err = np.abs(np.asarray(pot, np.float64) - oracle)
        print(f'{name} (rrel {float(rrel):.3e}):', flush=True)
        for mname, m in (('cond>0 (movement)', strong),
                         ('plateau (inert)', plateau)):
            print(f'  {mname:18s}: max {err[m].max():8.3f}  '
                  f'mean {err[m].mean():8.4f}  (of 1000)', flush=True)

    report('plain refined (stalled)', pot_plain, rr_plain)
    report('weak-deflation retry', pot_weak, rr_weak)


if __name__ == '__main__':
    main()

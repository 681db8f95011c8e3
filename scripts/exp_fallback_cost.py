"""Measure the f64 SuperLU fallback's cost at scale (VERDICT r3 item 3).

The 5e-3 safety net in Simulator._solve_potential hands stalled device
solves to solve_potential_direct. Its cost was only ever measured at
the 500x600 benchmark shape; a stall at 2048^2+ silently buys an
unknown host bill. This script times assemble / factor+solve and
records peak RSS on the dense-speckle adversarial class (the only
field class that still stalls the device solver, ~20% of seeds at
460^2 — scripts/exp_stall_freq.py).

Usage: python scripts/exp_fallback_cost.py [n ...]   (default 512 1024 2048)
Results go into docs/DESIGN.md ("fallback cost at scale") and set the
SSRS direct-fallback size policy in simulator.py.

Measured (round 4, 125 GB single-core host):
  512^2 : 4.9 s   / 0.94 GB
  1024^2: 41.8 s  / 3.4 GB
  2048^2: 364.4 s / 14.7 GB      (wall ~ unknowns^1.55, mem ~ ^1.1)
  4096^2: FAILS — SuperLU prints 'Not enough memory to perform
          factorization' (int32 fill-in indexing limit, not host RAM)
          and no solution is produced.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def speckle_conductivity(shape, seed=1, cell=64, keep=0.45):
    """Dense random speckle: the adversarial strip-island generator
    from exp_stall_freq.py (64^2 cells, ~45 percent conductive)."""
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    coarse = rng.random((cell, cell)) < keep
    reps = (-(-nrow // cell), -(-ncol // cell))
    w = np.kron(coarse, np.ones(reps)).astype(np.float32)[:nrow, :ncol]
    w *= 0.5 + rng.random((nrow, ncol)).astype(np.float32)
    return w


def main(sizes):
    from ssrs_tpu.potential.direct import solve_potential_direct
    out = []
    for n in sizes:
        shape = (n, n)
        cond = speckle_conductivity(shape)
        t0 = time.perf_counter()
        pot = solve_potential_direct(cond, 0.)
        dt = time.perf_counter() - t0
        rss_gb = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024 ** 2
        rec = {'n': n, 'unknowns': n * n,
               'wall_seconds': round(dt, 1),
               'peak_rss_gb': round(rss_gb, 2),
               'finite': bool(np.isfinite(pot).all())}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({'table': out}))


if __name__ == '__main__':
    main([int(a) for a in sys.argv[1:]] or [512, 1024, 2048])

"""Localize the stalled residual of the /tmp/stall_field.npy solve
(exp_stall_diag.py): solve on device, pull the potential, assemble the
TRUE difference-form operator on host (f64), and report where the
scaled residual D^-1 r concentrates — by column (east-strip?), by
island membership (strip islands? sound islands? plateau?), and the
top offending cells. Also compares against the f64 direct solution's
error distribution if SL_DIRECT=1 (adds ~90 s).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    from ssrs_tpu.potential.lap import island_labels, weight_planes
    import jax.numpy as jnp

    cond = np.load('/tmp/stall_field.npy')
    nrow, ncol = cond.shape
    bmask, bvals = boundary_masks(0., (nrow, ncol))
    bmask_np = np.asarray(bmask, bool)
    bvals_np = np.asarray(bvals, np.float64)

    pot, rrel = solve_potential_refined(cond, bmask, bvals)
    pot = np.asarray(pot, np.float64)
    print(f'device solve rrel={float(rrel):.3e}', flush=True)

    # difference-form residual in f64 with the solver's own planes
    planes = np.asarray(weight_planes(jnp.asarray(cond)), np.float64)
    # planes[d] = weight to neighbor d; residual r_i = sum_d w_d (u_d - u_i)
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
            (1, 0), (1, 1)]
    u = np.where(bmask_np, bvals_np, pot)
    r = np.zeros_like(u)
    diag = np.zeros_like(u)
    for d, (dr, dc) in enumerate(offs):
        w = planes[d]
        un = np.roll(np.roll(u, -dr, axis=0), -dc, axis=1)
        # roll wraps; zero the wrapped edges via validity mask
        valid = np.ones_like(u, bool)
        if dr == 1:
            valid[-1, :] = False
        if dr == -1:
            valid[0, :] = False
        if dc == 1:
            valid[:, -1] = False
        if dc == -1:
            valid[:, 0] = False
        r += np.where(valid, w * (un - u), 0.)
        diag += np.where(valid, w, 0.)
    r = np.where(bmask_np, 0., r)
    dinv = 1. / np.maximum(diag, 1e-30)
    sr = np.abs(r * dinv)
    sr = np.where(bmask_np, 0., sr)
    norm = np.linalg.norm(sr)
    print(f'host f64 scaled-resid norm={norm:.3e} max={sr.max():.3e}',
          flush=True)

    labels, k = island_labels(cond, bmask_np)
    strip_ids = np.unique(labels[:, -2:])
    strip_ids = strip_ids[strip_ids > 0]
    in_strip_island = np.isin(labels, strip_ids)
    on_plateau = (cond <= 0) & ~bmask_np
    in_sound_island = (labels > 0) & ~in_strip_island

    def mass(mask, name):
        m = float(np.linalg.norm(sr[mask])) if mask.any() else 0.
        print(f'  {name:24s}: norm {m:.3e} ({100 * (m / norm) ** 2:.1f}% '
              f'of squared mass), cells {int(mask.sum())}', flush=True)

    mass(in_strip_island, 'strip islands')
    mass(in_sound_island, 'sound (deflated) islands')
    mass(on_plateau, 'plateau (cond=0)')
    mass((labels == 0) & (cond > 0) & ~bmask_np, 'anchored background')
    # column distribution of the top tail
    east2 = np.zeros_like(sr, bool)
    east2[:, -2:] = True
    mass(east2 & ~bmask_np, 'last 2 columns')
    top = np.argsort(sr.ravel())[-10:][::-1]
    for t in top:
        i, j = divmod(int(t), ncol)
        print(f'  top cell ({i},{j}) sr={sr[i, j]:.3e} cond>0='
              f'{bool(cond[i, j] > 0)} label={int(labels[i, j])} '
              f'strip={bool(in_strip_island[i, j])}', flush=True)


if __name__ == '__main__':
    main()

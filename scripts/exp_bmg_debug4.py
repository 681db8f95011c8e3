"""Compare probed BoxMG coarse operator vs f64 dense Galerkin on a small
island field; check island leak (z^T A_c z) fidelity level by level."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from scripts.exp_bmg_check import dense_A, dense_P, hard_conductivity
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (_DELTAS, coarse_shape, galerkin_rap,
                                      host_decimate_labels, interp_planes)
from ssrs_tpu.potential.lap import island_labels, weight_planes

SHAPE = (48, 56)


def main():
    shape = SHAPE
    cond = hard_conductivity(shape, seed=1)
    bmask, _ = boundary_masks(225., shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    print(f'{shape} islands={k}')
    planes = weight_planes(cond)

    lab, bm = np.asarray(labels), bmask_np
    planes_j = planes
    for lev in range(3):
        m, n = planes_j.shape[-2:]
        pw = interp_planes(planes_j, jnp.asarray(bm))
        P = dense_P(pw, (m, n)).astype(np.float64)
        A = dense_A(planes_j, (m, n)).astype(np.float64)
        Ac = P.T @ A @ P
        mc, nc = coarse_shape((m, n))

        wc_j, sc_j = galerkin_rap(planes_j, pw)
        wc, sc = np.asarray(wc_j, np.float64), np.asarray(sc_j, np.float64)

        lab_c, bm_c = host_decimate_labels(lab, bm)

        # per-entry compare on island-boundary rows
        errs_abs, true_small = [], []
        for kk, (dr, dc) in enumerate(_DELTAS):
            for r in range(mc):
                for c in range(nc):
                    rr, cc = r + dr, c + dc
                    want = (-Ac[r * nc + c, rr * nc + cc]
                            if 0 <= rr < mc and 0 <= cc < nc else 0.)
                    got = wc[kk, r, c]
                    errs_abs.append(abs(got - want))
                    if 0 < abs(want) < 1e-5:
                        true_small.append((abs(got - want), abs(want)))
        errs_abs = np.array(errs_abs)
        print(f'  level {lev}->{lev + 1} ({m},{n})->({mc},{nc}): '
              f'max abs W err {errs_abs.max():.2e}')
        if true_small:
            ts = np.array(true_small)
            print(f'    tiny-true entries (|w|<1e-5): n={len(ts)} '
                  f'max abs err {ts[:, 0].max():.2e} '
                  f'max rel err {np.max(ts[:, 0] / ts[:, 1]):.2e}')

        # island leak fidelity: z^T A_c z per island, dense f64 vs the
        # difference-form cross-edge + s reconstruction
        for i in range(1, min(k + 1, 6)):
            z = (lab_c == i).astype(np.float64).ravel()
            if z.sum() == 0:
                continue
            true_leak = z @ Ac @ z
            # reconstruction as island_zaz does it: cross-edge W sums + s
            leak_w = 0.0
            labf = lab_c
            for kk, (dr, dc) in enumerate(_DELTAS):
                sh = np.full_like(labf, -1)
                src = labf[max(0, -dr):labf.shape[0] - max(0, dr),
                           max(0, -dc):labf.shape[1] - max(0, dc)]
                sh[max(0, dr):labf.shape[0] + min(0, dr),
                   max(0, dc):labf.shape[1] + min(0, dc)] = src
                cross = (labf == i) & (sh != i)
                leak_w += wc[kk][cross].sum()
            leak_s = sc[labf == i].sum()
            print(f'    island {i}: dense z^T Ac z={true_leak:.4e}  '
                  f'cross-W={leak_w:.4e}  +s={leak_s:.4e}  '
                  f'recon={leak_w + leak_s:.4e}')
        lab, bm = lab_c, bm_c
        planes_j = wc_j  # NOTE: drops s from the next-level operator,
        # matching what build_bmg_levels passes (planes, s) — here we
        # only examine one coarsening at a time with s folded separately.


if __name__ == '__main__':
    main()

"""Independent NumPy oracle implementations of the reference formulas.

These are written from the formula descriptions in SURVEY.md / the
reference's documented behavior (ssrs/layers.py, ssrs/movmodel.py) and are
deliberately structured differently from both the reference and the device
kernels, so a bug must be made twice to slip through.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def slope_aspect_oracle(z, res):
    """Horn 3x3 slope/aspect with the reference's axis convention
    (axis 0 is 'x'); border cells zero."""
    nrow, ncol = z.shape
    # Horn kernel along axis 0 (the reference's "x") on interior cells
    gx = np.zeros_like(z)
    gy = np.zeros_like(z)
    w = np.array([1., 2., 1.])
    for k, off in enumerate((-1, 0, 1)):
        gx[1:-1, 1:-1] += w[k] * (z[2:, 1 + off:ncol - 1 + off]
                                  - z[:-2, 1 + off:ncol - 1 + off])
        gy[1:-1, 1:-1] += w[k] * (z[1 + off:nrow - 1 + off, 2:]
                                  - z[1 + off:nrow - 1 + off, :-2])
    gx /= 8. * res
    gy /= 8. * res
    slope = np.degrees(np.arctan(np.hypot(gx, gy)))
    slope[0, :] = slope[-1, :] = 0.
    slope[:, 0] = slope[:, -1] = 0.
    gxi = np.where(gx == 0., 1e-10, gx)
    aspect = 180. - np.degrees(np.arctan(gy / gxi)) + 90. * np.sign(gxi)
    aspect[0, :] = aspect[-1, :] = 0.
    aspect[:, 0] = aspect[:, -1] = 0.
    return slope, aspect


def orographic_oracle(speed, dirn, slope, aspect):
    lift = np.cos(np.radians(aspect - dirn)).clip(min=0.)
    return (speed * np.sin(np.radians(slope)) * lift).clip(min=0.)


def threshold_oracle(w, thr):
    w = np.asarray(w, dtype=np.float64)
    blended = thr * np.expm1((w / thr) ** 5) / (np.e - 1.)
    out = np.where(w > thr, w, blended)
    return np.where(w > 1e-2, out, 0.)


def assemble_reference_system(cond):
    """Dense/sparse oracle of the reference's graph assembly + row
    normalization (ssrs/movmodel.py:59-112): column-major node order,
    per-node neighbor list with the alternating sqrt(2) facs applied
    AFTER boundary filtering — including the east-column quirk."""
    nrow, ncol = cond.shape
    n = nrow * ncol
    rows, cols, vals = [], [], []
    for i in range(n):
        if (i + 1) % nrow == 0:
            nearby = [i + nrow, i + nrow - 1, i - 1, i - nrow - 1, i - nrow]
        elif i % nrow == 0:
            nearby = [i - nrow, i - nrow + 1, i + 1, i + nrow + 1, i + nrow]
        else:
            nearby = [i - nrow, i - nrow + 1, i + 1, i + nrow + 1, i + nrow,
                      i + nrow - 1, i - 1, i - nrow - 1]
        nearby = [x for x in nearby if 0 <= x < n]
        for k, j in enumerate(nearby):
            ca = cond[i % nrow, i // nrow]
            cb = cond[j % nrow, j // nrow]
            hm = 2. / (1. / ca + 1. / cb) if (ca != 0 and cb != 0) else 1e-8
            fac = np.sqrt(2.) if k % 2 else 1.
            rows.append(i)
            cols.append(j)
            vals.append(hm / fac)
    g = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    rowsum = np.asarray(g.sum(axis=1)).ravel()
    dinv = sp.diags(1.0 / rowsum)
    return dinv @ g


def solve_reference_potential(cond, bnodes, bvals):
    """Direct solve of (I - P_ii) x_i = P_ib b (ssrs/movmodel.py:113-128)."""
    nrow, ncol = cond.shape
    n = nrow * ncol
    p = assemble_reference_system(cond).tocsc()
    inner = np.setdiff1d(np.arange(n), bnodes, assume_unique=True)
    p_rows = p[inner, :]
    a = sp.eye(inner.size).tocsc() - p_rows[:, inner]
    rhs = p_rows[:, bnodes] @ bvals
    x_inner = sp.linalg.spsolve(a.tocsc(), rhs)
    full = np.empty(n)
    full[inner] = x_inner
    full[bnodes] = bvals
    out = np.empty((nrow, ncol))
    for i in range(n):
        out[i % nrow, i // nrow] = full[i]
    return out.astype(np.float32)


def directional_probs_oracle(dirn_deg):
    """9-vector directional prior; independent derivation: probability of
    move (dr, dc) is cos(angle between the move and the target heading),
    floored at 0.01 then clipped to 0 (matches ssrs/movmodel.py:247-257
    where headings are measured cw from north = +row axis)."""
    theta = np.radians(dirn_deg)
    # heading cw from north; +row is north, +col is east
    target = np.array([np.cos(theta), np.sin(theta)])
    out = np.zeros(9)
    for m in range(9):
        dr, dc = m // 3 - 1, m % 3 - 1
        if dr == 0 and dc == 0:
            continue
        v = np.array([dr, dc], dtype=float)
        v /= np.linalg.norm(v)
        c = float(v @ target)
        out[m] = 0. if c < 0.01 else c
    return out

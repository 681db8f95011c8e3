"""Operator-dependent (BoxMG-style) multigrid on the Jacobi-normalized
operator — the production GCR preconditioner for the potential solve.

Why this design (measured history, details in docs/DESIGN.md):

- The piecewise-constant-aggregation hierarchy in ``lap.py`` is
  mesh-independent on smooth fields but asymptotes at ~0.86/iter under
  GCR on many-island thresholded-updraft fields: block-constant coarse
  functions cannot represent error modes that vary across the 1e-8/O(1)
  conductivity jumps inside a 2x2 block.
- Classical BoxMG (Dendy) on the RAW operator fixes the interpolation
  but cannot be made to work in f32 here: the Galerkin stencil mixes
  O(1) and O(1e-8) scales in single rows, so f32 stencil algebra loses
  the island physics that lap.py's exact difference form preserves. All
  f32 variants failed (all-level deflation NaN'd or ran 0.93/iter;
  f64-build + f32-cycle 0.93; finest-only deflation 0.89) while the
  same hierarchy in f64 ran 0.742/iter — a pure precision failure.
- The fix is to build the hierarchy on the SYMMETRICALLY SCALED
  operator A^ = D^-1/2 A D^-1/2: every diagonal is exactly 1, every row
  is O(1), and the island-constant modes — Rayleigh quotient
  z^T A z / z^T D z ~ perimeter/(8 |island|) — become ordinary low
  modes instead of 1e-8 pathologies. No deflation is needed anywhere in
  the cycle, and pure f32 reaches the same fast rate as f64:
  0.3-0.45/iter measured at 256^2-512^2 (scripts/exp_bmg_gcr.py),
  stalling only at the f32 floor (~1e-6 relative) that the refinement
  driver in lap.py re-centers across passes.
- Coarse Galerkin stencils grow large positive off-diagonals
  (lambda_max(D^-1 A) measured up to 3-4 on coarse levels,
  scripts/exp_bmg_lmax.py), so a fixed Jacobi omega amplifies; each
  level stores omega = 1.54/lambda_max from a build-time power
  iteration.

The interpolation is Dendy's: coarsen by vertex decimation (coarse
point J lives at fine (2Jr, 2Jc)) and build the stencil FROM THE
OPERATOR so interpolated corrections are locally algebraically smooth
across jumps:

- fine points at (even, odd) interpolate from their left/right coarse
  neighbors with weights from collapsing the 9-point stencil vertically
  (``p_left = (W_W + W_NW + W_SW) / (that + W_E + W_NE + W_SE)``);
- (odd, even) points symmetrically from up/down neighbors;
- (odd, odd) points from their 4 diagonal coarse neighbors by
  eliminating the fine equation with the already-built edge-point
  weights.

Dirichlet rows of P are zeroed: corrections are clamped there anyway,
and zeroing them makes R A P build the correct interior coarse operator
without special cases.

TPU shapes (the measured rules from docs/DESIGN.md): no stride-2 slices
anywhere — decimation/zero-upsampling are selector-matrix matmuls
(MXU), everything else is parity masks + pad-and-slice shifts, the same
pattern as ``_apply_lap``. The Galerkin product R A P is not
hand-derived; because P and A have reach <= 1 fine cell, the coarse
stencil has reach <= 1 coarse cell, and applying R∘A∘P to the nine
mod-3 lattice colorings reads off every stencil entry exactly
(build-time: 9 composed applies per level).

Reference for what this solves: ``MovModel.solve_sparse_linear_system``
(ssrs/movmodel.py:86-128); the SuperLU direct solve there is rate-free
on any field, which is the robustness bar.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ssrs_tpu.potential.lap import _DELTAS, _HI, _apply_lap

# 3x3 interpolation deltas in fixed order; pw[k][x] is the weight from
# the coarse point at fine coordinate x + _P_DELTAS[k] to fine point x.
_P_DELTAS = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
_W_BY_DELTA = {d: k for k, d in enumerate(_DELTAS)}


def _wplane(planes: jax.Array, dr: int, dc: int) -> jax.Array:
    return planes[_W_BY_DELTA[(dr, dc)]]


def _shift0(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """x sampled at (r + dr, c + dc), zero outside the grid."""
    nrow, ncol = x.shape
    xp = jnp.pad(x, 1)
    return jax.lax.slice(xp, (dr + 1, dc + 1), (dr + 1 + nrow,
                                                dc + 1 + ncol))


def coarse_shape(shape: Tuple[int, int]) -> Tuple[int, int]:
    return (-(-shape[0] // 2), -(-shape[1] // 2))


def _parity_masks(shape, dtype):
    ri = jax.lax.broadcasted_iota(jnp.int32, shape, 0) % 2
    ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1) % 2
    return {(a, b): ((ri == a) & (ci == b)).astype(dtype)
            for a in (0, 1) for b in (0, 1)}


def interp_planes(planes: jax.Array, bmask: jax.Array) -> jax.Array:
    """(9, nrow, ncol) interpolation-weight planes from the
    difference-form edge weights. ``out[k][x]`` is the P entry from the
    coarse point at fine ``x + _P_DELTAS[k]``; entries are nonzero only
    where that location is an in-grid even-even point and ``x`` is not
    Dirichlet."""
    nrow, ncol = planes.shape[-2:]
    par = _parity_masks((nrow, ncol), planes.dtype)
    notb = (~jnp.asarray(bmask, bool)).astype(planes.dtype)

    def safe_div(num, den):
        ok = den > 0.
        return jnp.where(ok, num / jnp.where(ok, den, 1.), 0.)

    # horizontal edge points (even row, odd col): left/right collapse
    wl = (_wplane(planes, 0, -1) + _wplane(planes, -1, -1)
          + _wplane(planes, 1, -1))
    wr = (_wplane(planes, 0, 1) + _wplane(planes, -1, 1)
          + _wplane(planes, 1, 1))
    pl = safe_div(wl, wl + wr)
    pr = safe_div(wr, wl + wr)

    # vertical edge points (odd row, even col): up/down collapse
    wu = (_wplane(planes, -1, 0) + _wplane(planes, -1, -1)
          + _wplane(planes, -1, 1))
    wd = (_wplane(planes, 1, 0) + _wplane(planes, 1, -1)
          + _wplane(planes, 1, 1))
    pu = safe_div(wu, wu + wd)
    pd = safe_div(wd, wu + wd)

    # interior (odd, odd) points: eliminate through the 4 edge neighbors
    num_a = (_wplane(planes, -1, -1)
             + _wplane(planes, -1, 0) * _shift0(pl, -1, 0)
             + _wplane(planes, 0, -1) * _shift0(pu, 0, -1))
    num_b = (_wplane(planes, -1, 1)
             + _wplane(planes, -1, 0) * _shift0(pr, -1, 0)
             + _wplane(planes, 0, 1) * _shift0(pu, 0, 1))
    num_c = (_wplane(planes, 1, -1)
             + _wplane(planes, 1, 0) * _shift0(pl, 1, 0)
             + _wplane(planes, 0, -1) * _shift0(pd, 0, -1))
    num_d = (_wplane(planes, 1, 1)
             + _wplane(planes, 1, 0) * _shift0(pr, 1, 0)
             + _wplane(planes, 0, 1) * _shift0(pd, 0, 1))
    den = num_a + num_b + num_c + num_d
    pa, pb = safe_div(num_a, den), safe_div(num_b, den)
    pc, pdg = safe_div(num_c, den), safe_div(num_d, den)

    ee, eo = par[(0, 0)], par[(0, 1)]
    oe, oo = par[(1, 0)], par[(1, 1)]
    zero = jnp.zeros((nrow, ncol), planes.dtype)
    by_delta = {
        (0, 0): ee,
        (0, -1): eo * pl, (0, 1): eo * pr,
        (-1, 0): oe * pu, (1, 0): oe * pd,
        (-1, -1): oo * pa, (-1, 1): oo * pb,
        (1, -1): oo * pc, (1, 1): oo * pdg,
    }
    out = jnp.stack([by_delta.get(d, zero) for d in _P_DELTAS])
    return out * notb[None]


def _sel_dec(mc: int, m: int, dtype) -> jax.Array:
    """(mc, m) decimation selector: row I reads fine row 2I."""
    i = jax.lax.broadcasted_iota(jnp.int32, (mc, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (mc, m), 1)
    return (j == 2 * i).astype(dtype)


def _upsample(e: jax.Array, fine_shape: Tuple[int, int]) -> jax.Array:
    """Zero-upsample coarse values onto even-even fine points (two
    selector matmuls; stride-2 writes shuffle the 128-lane axis)."""
    mc, nc = e.shape
    ur = _sel_dec(mc, fine_shape[0], e.dtype).T
    uc = _sel_dec(nc, fine_shape[1], e.dtype)
    return jnp.matmul(jnp.matmul(ur, e, precision=_HI), uc, precision=_HI)


def _downsample(g: jax.Array) -> jax.Array:
    """Read g at even-even fine points -> coarse grid."""
    m, n = g.shape
    mc, nc = coarse_shape((m, n))
    dr = _sel_dec(mc, m, g.dtype)
    dc = _sel_dec(nc, n, g.dtype).T
    return jnp.matmul(jnp.matmul(dr, g, precision=_HI), dc, precision=_HI)


def prolong_bmg(e_c: jax.Array, pw: jax.Array,
                fine_shape: Tuple[int, int]) -> jax.Array:
    """(P e)(x) = sum_k pw[k][x] * e_up(x + d_k)."""
    e_up = _upsample(e_c, fine_shape)
    acc = jnp.zeros(fine_shape, e_up.dtype)
    for k, (dr, dc) in enumerate(_P_DELTAS):
        acc = acc + pw[k] * _shift0(e_up, dr, dc)
    return acc


def restrict_bmg(r: jax.Array, pw: jax.Array) -> jax.Array:
    """(P^T r)(I) = sum_k (pw[k] * r) at fine(I) - d_k."""
    acc = jnp.zeros_like(r)
    for k, (dr, dc) in enumerate(_P_DELTAS):
        acc = acc + _shift0(pw[k] * r, -dr, -dc)
    return _downsample(acc)


def galerkin_rap(planes: jax.Array, pw: jax.Array,
                 s: jax.Array = None) -> Tuple[jax.Array, jax.Array]:
    """Coarse (planes, s) of P^T A P for A u = sum W_d (u - u_d) + s u.

    ``A_comp = restrict ∘ A ∘ prolong`` has coarse stencil reach <= 1,
    so applying it to the nine mod-3 lattice colorings v_{ab}(J) =
    [J ≡ (a, b) mod 3] yields every stencil entry with no aliasing:
    ``stencil[I, D] = (A_comp v)(I)`` for the coloring containing I + D.
    Off-diagonals become coarse W planes (``W_D = -stencil[., D]``); the
    diagonal is split into the implied part ``sum_D W_D`` plus the
    excess ``s_c``. The split is EXACT — any thresholding or clipping of
    s_c perturbs the Galerkin operator enough to destroy the cycle
    (measured: a 1e-4-relative sweep turned a contracting f64 cycle into
    a 3.7x/iter divergence)."""
    fine_shape = planes.shape[-2:]
    mc, nc = coarse_shape(fine_shape)
    ri = jax.lax.broadcasted_iota(jnp.int32, (mc, nc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (mc, nc), 1)
    acc = {d: jnp.zeros((mc, nc), planes.dtype) for d in _DELTAS}
    diag = jnp.zeros((mc, nc), planes.dtype)
    for a in range(3):
        for b in range(3):
            v = ((ri % 3 == a) & (ci % 3 == b)).astype(planes.dtype)
            pv = prolong_bmg(v, pw, fine_shape)
            av = _apply_lap(planes, pv)
            if s is not None:
                av = av + s * pv
            t = restrict_bmg(av, pw)
            diag = diag + jnp.where((ri % 3 == a) & (ci % 3 == b), t, 0.)
            for d in _DELTAS:
                sel = ((ri + d[0]) % 3 == a) & ((ci + d[1]) % 3 == b)
                # entries whose neighbor I+D falls outside the coarse
                # grid are not stencil entries; _shift0-style zeroing
                inb = ((ri + d[0] >= 0) & (ri + d[0] < mc)
                       & (ci + d[1] >= 0) & (ci + d[1] < nc))
                acc[d] = acc[d] + jnp.where(sel & inb, -t, 0.)
    planes_c = jnp.stack([acc[d] for d in _DELTAS])
    s_c = diag - jnp.sum(planes_c, axis=0)
    return planes_c, s_c


# ---- Jacobi-normalized hierarchy -------------------------------------------


def scaled_planes(planes: jax.Array
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(W^ planes, s^, dsi): A^ = D^-1/2 A D^-1/2 in planes + diagonal-
    excess form. ``W^_d(x) = W_d(x) dsi(x) dsi(x+d)``;
    ``s^ = 1 - sum_d W^_d`` where the diagonal is nonzero, so diag(A^)
    is exactly 1 on live rows. dsi = D^-1/2 (0 on dead rows)."""
    diag = jnp.sum(planes, axis=0)
    ok = diag > 0.
    dsi = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, diag, 1.)), 0.)
    wt = jnp.stack([planes[k] * dsi * _shift0(dsi, dr, dc)
                    for k, (dr, dc) in enumerate(_DELTAS)])
    s = jnp.where(ok, 1.0 - jnp.sum(wt, axis=0), 0.)
    return wt, s, dsi


class BmgLevel(NamedTuple):
    planes: jax.Array  # (8, nrow, ncol) difference-form edge weights
    s: jax.Array       # (nrow, ncol) diagonal excess (A u += s u)
    notb: jax.Array    # (nrow, ncol) 1.0 where NOT Dirichlet
    dinv: jax.Array    # (nrow, ncol) 1/(sum W + s); 0 on dead rows
    omega: jax.Array   # () per-level Jacobi damping (see _level_omega)

    @property
    def shape(self):
        return self.planes.shape[-2:]


def apply_bmg(level: BmgLevel, u: jax.Array) -> jax.Array:
    return _apply_lap(level.planes, u) + level.s * u


def _smooth_bmg(level: BmgLevel, u: jax.Array, rhs: jax.Array,
                nsweeps: int) -> jax.Array:
    scale = level.omega * level.notb * level.dinv

    def body(_, u):
        return u + scale * (rhs - apply_bmg(level, u))
    return jax.lax.fori_loop(0, nsweeps, body, u)


# Target omega * lambda_max(D^-1 A): 0.85 * 1.81 (the measured
# fine-level lambda on the hard speckle class) — keeps the fine-grid
# smoothing strength the pc hierarchy was tuned at, while coarse
# Galerkin levels (lambda measured up to 3-4) get proportionally damped.
_OMEGA_TARGET = 1.54


def _level_omega(planes: jax.Array, s, notb: jax.Array, dinv: jax.Array,
                 iters: int = 40) -> jax.Array:
    """omega = _OMEGA_TARGET / lambda_max(D^-1 A) via power iteration
    (build-time, jittable; a deterministic quasi-random start vector so
    builds are reproducible under jit)."""
    nrow, ncol = planes.shape[-2:]
    dt = planes.dtype
    ri = jax.lax.broadcasted_iota(dt, (nrow, ncol), 0)
    ci = jax.lax.broadcasted_iota(dt, (nrow, ncol), 1)
    v0 = (jnp.sin(12.9898 * ri + 78.233 * ci) * 0.5 + 0.5) \
        * notb.astype(dt)

    def apply(u):
        out = _apply_lap(planes, u)
        if s is not None:
            out = out + s * u
        return notb * dinv * out

    def body(_, carry):
        v, _ = carry
        w = apply(v)
        n = jnp.linalg.norm(w)
        return w / jnp.maximum(n, 1e-30), n

    _, lam = jax.lax.fori_loop(0, iters, body,
                               (v0 / jnp.maximum(jnp.linalg.norm(v0),
                                                 1e-30),
                                jnp.asarray(1., dt)))
    # power iteration underestimates; 5% headroom, cap against omega > 1
    return jnp.minimum(_OMEGA_TARGET / (1.05 * jnp.maximum(lam, 1e-6)),
                       jnp.asarray(0.95, dt))


def num_bmg_levels(shape: Tuple[int, int], min_size: int = 4) -> int:
    n, lev = min(shape), 1
    while n > min_size:
        n = -(-n // 2)
        lev += 1
    return lev


def build_scaled_levels(planes: jax.Array, bmask: jax.Array
                        ) -> Tuple[List[BmgLevel], List[jax.Array],
                                   jax.Array]:
    """(levels, pws, dsi): the Jacobi-normalized BoxMG hierarchy.
    levels[i] lives on decimation grid i; pws[i] interpolates level i+1
    -> i; dsi = D^-1/2 of the ORIGINAL operator, for wrapping the cycle
    into a preconditioner for the unscaled system (precond_scaled)."""
    wt, s, dsi = scaled_planes(planes)
    mask = jnp.asarray(bmask, bool)
    levels: List[BmgLevel] = []
    pws: List[jax.Array] = []
    nlev = num_bmg_levels(planes.shape[-2:])
    for i in range(nlev):
        notb = (~mask).astype(wt.dtype)
        diag = jnp.sum(wt, axis=0) + s
        ok = diag > 0.
        dinv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.), 0.)
        levels.append(BmgLevel(planes=wt, s=s, notb=notb, dinv=dinv,
                               omega=_level_omega(wt, s, notb, dinv)))
        if i + 1 < nlev:
            pw = interp_planes(wt, mask)
            pws.append(pw)
            wt, s = galerkin_rap(wt, pw, s=s)
            mask = _downsample(mask.astype(pw.dtype)) > 0.5
    return levels, pws, dsi


def vcycle_scaled(levels: List[BmgLevel], pws: List[jax.Array],
                  rhs: jax.Array, u0: jax.Array, nu1: int = 2,
                  nu2: int = 2, coarse_sweeps: int = 32) -> jax.Array:
    """One V(nu1, nu2) cycle on the scaled system. No deflation anywhere:
    under Jacobi normalization the island modes are ordinary low modes
    the coarse grids capture (module docstring)."""
    def cycle(idx: int, u: jax.Array, rhs: jax.Array) -> jax.Array:
        level = levels[idx]
        if idx == len(levels) - 1:
            return _smooth_bmg(level, u, rhs, coarse_sweeps)
        u = _smooth_bmg(level, u, rhs, nu1)
        r = (rhs - apply_bmg(level, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = restrict_bmg(r, pws[idx]) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + prolong_bmg(e_c, pws[idx], level.shape) * level.notb
        return _smooth_bmg(level, u, rhs, nu2)

    return cycle(0, u0, rhs)


def precond_scaled(levels: List[BmgLevel], pws: List[jax.Array],
                   dsi: jax.Array, r: jax.Array) -> jax.Array:
    """M^-1 r = D^-1/2 vcycle(D^-1/2 r) — one scaled cycle as a
    preconditioner for the ORIGINAL difference-form system."""
    return dsi * vcycle_scaled(levels, pws, dsi * r,
                               jnp.zeros_like(r))

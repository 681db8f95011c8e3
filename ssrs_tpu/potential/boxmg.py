"""Operator-dependent (BoxMG-style) transfers for the lap solver.

The piecewise-constant-aggregation hierarchy in ``lap.py`` is
mesh-independent on smooth fields but keeps an asymptotic GCR rate of
~0.86/iter on many-island thresholded-updraft fields (docs/DESIGN.md,
"the remaining limit is algorithmic"): block-constant coarse functions
cannot represent error modes that vary across the 1e-8/O(1) conductivity
jumps inside a 2x2 block. The classical fix is Dendy's BoxMG: coarsen by
vertex decimation (coarse point J lives at fine (2Jr, 2Jc)) and build the
interpolation stencil FROM THE OPERATOR so interpolated corrections are
(locally) algebraically smooth across jumps:

- fine points at (even, odd) interpolate from their left/right coarse
  neighbors with weights from collapsing the 9-point stencil vertically
  (``p_left = (W_W + W_NW + W_SW) / (that + W_E + W_NE + W_SE)``);
- (odd, even) points symmetrically from up/down neighbors;
- (odd, odd) points from their 4 diagonal coarse neighbors by eliminating
  the fine equation with the already-built edge-point weights.

Rows of P sum to 1 exactly (each class normalizes by its own numerator
sum), so the Galerkin coarse operator annihilates constants and stays
expressible in the difference form ``A u = sum_d W_d (u - u_{+d})`` that
makes f32 safe (lap.py module docstring). Dirichlet rows of P are zeroed:
corrections are clamped there anyway, and zeroing them makes R A P build
the correct interior coarse operator without special cases.

TPU shapes (the measured rules from docs/DESIGN.md): no stride-2 slices
anywhere — decimation/zero-upsampling are selector-matrix matmuls (MXU),
everything else is parity masks + pad-and-slice shifts, the same pattern
as ``_apply_lap``. The Galerkin product R A P is not hand-derived;
because P and A have reach <= 1 fine cell, the coarse stencil has reach
<= 1 coarse cell, and applying R∘A∘P to the nine mod-3 lattice
colorings reads off every stencil entry exactly (build-time: 9 composed
applies per level).

Reference for what this solves: ``MovModel.solve_sparse_linear_system``
(ssrs/movmodel.py:86-128); the SuperLU direct solve there is rate-free on
any field, which is the robustness bar (VERDICT r2 item 2).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lap import (_DELTAS, _HI, LapLevel, _apply_lap, _onehot_slots,
                  island_zaz)

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
    """(9, nrow, ncol) interpolation-weight planes from the difference-form
    edge weights. ``out[k][x]`` is the P entry from the coarse point at
    fine ``x + _P_DELTAS[k]``; entries are nonzero only where that
    location is an in-grid even-even point and ``x`` is not Dirichlet."""
    nrow, ncol = planes.shape[-2:]
    par = _parity_masks((nrow, ncol), jnp.float32)
    notb = (~jnp.asarray(bmask, bool)).astype(jnp.float32)

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
    zero = jnp.zeros((nrow, ncol), jnp.float32)
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
                 s: jax.Array = None, raw_s: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """Coarse (planes, s) of P^T A P for A u = sum W_d (u - u_d) + s u.

    ``A_comp = restrict ∘ A ∘ prolong`` has coarse stencil reach <= 1, so
    applying it to the nine mod-3 lattice colorings v_{ab}(J) =
    [J ≡ (a, b) mod 3] yields every stencil entry with no aliasing:
    ``stencil[I, D] = (A_comp v)(I)`` for the coloring containing I + D.
    Off-diagonals become coarse W planes (``W_D = -stencil[., D]``); the
    diagonal is split into the implied part ``sum_D W_D`` plus the excess
    ``s_c`` — the excess is the boundary-clamping stiffness (P rows at
    Dirichlet cells are zero, so constants are NOT in the coarse null
    space near the boundary). In exact arithmetic s_c is identically 0
    away from Dirichlet influence; the f32 rounding residue there
    (~1e-7 relative, exactly the island disease of the lap.py module
    docstring) is swept to 0 with a relative threshold."""
    fine_shape = planes.shape[-2:]
    mc, nc = coarse_shape(fine_shape)
    ri = jax.lax.broadcasted_iota(jnp.int32, (mc, nc), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (mc, nc), 1)
    acc = {d: jnp.zeros((mc, nc), jnp.float32) for d in _DELTAS}
    diag = jnp.zeros((mc, nc), jnp.float32)
    for a in range(3):
        for b in range(3):
            v = ((ri % 3 == a) & (ci % 3 == b)).astype(jnp.float32)
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
    implied = jnp.sum(planes_c, axis=0)
    s_c = diag - implied
    # interior rounding residue -> exact 0 (relative threshold; true
    # boundary excess is O(local stencil weight), residue is ~1e-7 of it)
    if not raw_s:
        s_c = jnp.where(jnp.abs(s_c) > 1e-4 * jnp.abs(diag), s_c, 0.)
        s_c = jnp.maximum(s_c, 0.)
    return planes_c, s_c


# ---- host-side label/bmask decimation for the deflation hierarchy ----------


def host_decimate_labels(labels: np.ndarray, bmask: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Vertex-decimation counterpart of ``_host_coarsen_labels``: the
    coarse point inherits the label and Dirichlet-ness of its own fine
    location. Islands entirely inside odd rows/cols disappear from coarse
    levels — their deflation happens on the finer levels that still see
    them."""
    lab_c = np.ascontiguousarray(labels[::2, ::2])
    bm_c = np.ascontiguousarray(bmask[::2, ::2])
    lab_c = np.where(bm_c, 0, lab_c)
    return lab_c, bm_c


def build_tile_hierarchy_bmg(labels: np.ndarray, bmask: np.ndarray,
                             min_size: int = 4):
    """Tile dictionaries per decimation level (device arrays), same
    structure as ``lap.build_tile_hierarchy`` but with vertex coarsening."""
    from .lap import TileSeg, _build_tile_level
    out = []
    lab = np.asarray(labels, np.int32)
    bm = np.asarray(bmask, bool)
    while True:
        lidx, slots, sidx, sisland = _build_tile_level(lab)
        out.append(TileSeg(lidx=lidx, slots=slots, sidx=sidx,
                           sisland=sisland, labels=lab))
        if min(lab.shape) <= min_size:
            break
        lab, bm = host_decimate_labels(lab, bm)
    return jax.device_put(out)


# ---- level hierarchy / cycle -------------------------------------------------


def _decimate_mask(mask: jax.Array) -> jax.Array:
    """Coarse Dirichlet mask by decimation (selector matmuls, f32)."""
    return _downsample(jnp.asarray(mask, jnp.float32)) > 0.5


# Target omega * lambda_max(D^-1 A): 0.85 * 1.81 (the measured fine-level
# lambda on the hard speckle class) — keeps the fine-grid smoothing
# strength the pc hierarchy was tuned at, while coarse Galerkin levels
# (lambda up to 3.0, scripts/exp_bmg_lmax.py) get proportionally damped.
_OMEGA_TARGET = 1.54


def _level_omega(planes: jax.Array, s, notb: jax.Array, dinv: jax.Array,
                 iters: int = 40) -> jax.Array:
    """omega = _OMEGA_TARGET / lambda_max(D^-1 A) via power iteration
    (build-time, jittable; a deterministic pseudo-random start vector —
    no Date/np.random so builds stay reproducible under jit)."""
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
    # power iteration underestimates; 5% headroom, floor against omega>1
    return jnp.minimum(_OMEGA_TARGET / (1.05 * jnp.maximum(lam, 1e-6)),
                       jnp.asarray(0.95, dt))


def build_bmg_levels(planes: jax.Array, bmask: jax.Array,
                     tiles: Sequence, num_segments: int,
                     raw_s: bool = True
                     ) -> Tuple[List[LapLevel], List[jax.Array]]:
    """(levels, pws): levels[i] is a LapLevel on decimation grid i,
    pws[i] are the interpolation planes from level i+1 to level i
    (len(pws) == len(levels) - 1)."""
    levels: List[LapLevel] = []
    pws: List[jax.Array] = []
    mask = jnp.asarray(bmask, bool)
    s = None
    for i, ts in enumerate(tiles):
        assert planes.shape[-2:] == ts.labels.shape, \
            (planes.shape, ts.labels.shape)
        onehot = _onehot_slots(ts.lidx, ts.slots.shape[1])
        diag = jnp.sum(planes, axis=0)
        if s is not None:
            diag = diag + s
        dinv = jnp.where(diag > 0., 1. / jnp.where(diag > 0., diag, 1.),
                         0.)
        zaz = island_zaz(planes, ts.labels, onehot, ts.sidx, ts.sisland,
                         num_segments, s=s)
        notb = (~mask).astype(jnp.float32)
        levels.append(LapLevel(
            planes=planes, notb=notb, dinv=dinv,
            onehot=onehot, sidx=ts.sidx, sisland=ts.sisland,
            zaz_inv=(1.0 / zaz).astype(jnp.float32), s=s,
            omega=_level_omega(planes, s, notb, dinv)))
        if i + 1 < len(tiles):
            pw = interp_planes(planes, mask)
            pws.append(pw)
            planes, s = galerkin_rap(planes, pw, s=s, raw_s=raw_s)
            mask = _decimate_mask(mask)
    return levels, pws


def vcycle_bmg(levels: List[LapLevel], pws: List[jax.Array],
               rhs: jax.Array, u0: jax.Array, omega: float = 0.85,
               nu1: int = 2, nu2: int = 2,
               coarse_sweeps: int = 32) -> jax.Array:
    """Deflated V-cycle with operator-dependent transfers (kappa = 1: the
    Galerkin operator under unit-row-sum interpolation needs no stiffness
    compensation, unlike the pc-aggregation hierarchy's kappa = 2)."""
    from .lap import _deflate, _smooth, apply_level

    def cycle(idx: int, u: jax.Array, rhs: jax.Array) -> jax.Array:
        level = levels[idx]
        if idx == len(levels) - 1:
            u = _smooth(level, u, rhs, omega, coarse_sweeps)
            return _deflate(level, u, rhs)
        u = _smooth(level, u, rhs, omega, nu1)
        u = _deflate(level, u, rhs)
        r = (rhs - apply_level(level, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = restrict_bmg(r, pws[idx]) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + prolong_bmg(e_c, pws[idx], level.shape) * level.notb
        u = _deflate(level, u, rhs)
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, u0, rhs)

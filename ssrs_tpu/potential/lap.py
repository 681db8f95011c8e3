"""Reference-exact directional potential on device: difference-form
operator + Galerkin multigrid + double-single iterative refinement +
island deflation.

Why the earlier row-normalized formulation could not match the f64 oracle
in f32 (measured in round 1, analysis in ``direct.py``): the system's hard
modes are the *levels* of high-conductivity islands surrounded by
zero-conductivity plateaus, coupled only through the reference's 1e-8
harmonic-mean floor (ssrs/movmodel.py:442-447). In the ``u - P u`` form,
float32 rounding of the row-normalized planes leaves row-sum defects of
~1e-7 — an order larger than the true 1e-8 leak couplings — so the f32
operator itself mis-levels every island by O(100) out of 1000.

This module removes the disease structurally instead of chasing digits:

1. **Difference form.** The same linear system (row normalization does not
   change the solution: ``(I - D^-1 W) x = D^-1 W b  <=>  (D - W) x = W b``)
   is applied as ``A u (i) = sum_d W_d(i) * (u_i - u_{i+d})`` — constants
   are *exactly* annihilated in any precision, so no row-sum defects exist
   by construction, and each edge term carries only ~1 ulp relative error.
2. **Double-single refinement.** The solution is carried as a two-float
   (hi, lo) pair and residuals are evaluated with error-free
   transformations (``ds.py``), so the ~1e-8-of-u island imbalance is
   visible instead of drowning in f32 cancellation noise (~3e-5 of u).
3. **Island deflation.** Connected components of ``cond > 0`` not anchored
   to the Dirichlet perimeter are a near-null subspace (eigenvalue ~
   leak/O(1)); a per-island subspace correction
   ``u += z_I (z_I^T r)/(z_I^T A z_I)`` fixes their levels in one shot per
   refinement pass. Labels come from one host ``scipy.ndimage.label`` per
   solve; on device it is one ``segment_sum``.
4. **Galerkin coarse grids.** With piecewise-constant prolongation and
   block-sum restriction, the Galerkin coarse operator of a difference-form
   stencil is again a difference-form stencil whose coarse edge weights are
   the sums of fine edges crossing the block boundary — so the 1e-8/O(1)
   contrast survives coarsening exactly (the round-1 rediscretization
   blurred zero plateaus into nonzero coarse conductivity, which is where
   the 0.86/cycle rate came from).

Reference semantics: ``MovModel.solve_sparse_linear_system``
(ssrs/movmodel.py:86-128), edge weights ``harmonic_mean/fac`` with the
east-column fac quirk (see ``solver.py``).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..agents.moves import NEIGHBOR_DELTAS
from .ds import DS, ds_add, ds_from, ds_mul_f32, ds_sub
from .solver import _DIRS, _fac_plane, _shift

_DELTAS = [(int(NEIGHBOR_DELTAS[m, 0]), int(NEIGHBOR_DELTAS[m, 1]))
           for m in _DIRS]
_DELTA_TO_K = {d: k for k, d in enumerate(_DELTAS)}


def weight_planes(conductivity: jax.Array) -> jax.Array:
    """Unnormalized edge weights ``W_d = hm(cond_i, cond_j) / fac_d``,
    shape (8, nrow, ncol); zero for out-of-grid neighbors. The
    row-normalized planes of ``solver.transition_planes`` are
    ``W / sum_d W``."""
    cond = jnp.asarray(conductivity, jnp.float32)
    nrow, ncol = cond.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, ncol), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nrow, ncol), 1)
    planes = []
    for k, (dr, dc) in enumerate(_DELTAS):
        nbr = _shift(cond, dr, dc)
        both_nz = (cond != 0.) & (nbr != 0.)
        safe_c = jnp.where(cond == 0., 1., cond)
        safe_n = jnp.where(nbr == 0., 1., nbr)
        hm = jnp.where(both_nz, 2.0 / (1.0 / safe_c + 1.0 / safe_n), 1e-8)
        in_grid = ((rows + dr >= 0) & (rows + dr < nrow) &
                   (cols + dc >= 0) & (cols + dc < ncol))
        fac = _fac_plane(dr, dc, rows, cols, nrow, ncol)
        planes.append(jnp.where(in_grid, hm / fac, 0.))
    return jnp.stack(planes)


class LapLevel(NamedTuple):
    planes: jax.Array   # (8, nrow, ncol) difference-form edge weights
    notb: jax.Array     # (nrow, ncol) 1.0 where NOT Dirichlet
    dinv: jax.Array     # (nrow, ncol) 1/sum_d W_d (0 where D == 0)
    labels: jax.Array   # (nrow, ncol) int32 island labels at this level
    zaz_inv: jax.Array  # (num,) 1/(z_I^T A_level z_I); index 0 unused

    @property
    def shape(self):
        return self.planes.shape[-2:]


def _apply_lap(planes: jax.Array, u: jax.Array) -> jax.Array:
    """A u = sum_d W_d * (u - shift_d(u)). One pad, eight static slices."""
    nrow, ncol = u.shape
    upad = jnp.pad(u, 1)
    acc = jnp.zeros_like(u)
    for k, (dr, dc) in enumerate(_DELTAS):
        nb = jax.lax.slice(upad, (dr + 1, dc + 1),
                           (dr + 1 + nrow, dc + 1 + ncol))
        acc = acc + planes[k] * (u - nb)
    return acc


def apply_lap_ds(planes: jax.Array, u: DS) -> DS:
    """A u in double-single: differences and accumulation are error-free,
    edge weights are plain f32 (their ~1 ulp relative error perturbs the
    solution by only ~1e-7 * 1000)."""
    nrow, ncol = u.hi.shape
    ph = jnp.pad(u.hi, 1)
    pl = jnp.pad(u.lo, 1)
    acc = DS(jnp.zeros_like(u.hi), jnp.zeros_like(u.hi))
    for k, (dr, dc) in enumerate(_DELTAS):
        nh = jax.lax.slice(ph, (dr + 1, dc + 1),
                           (dr + 1 + nrow, dc + 1 + ncol))
        nl = jax.lax.slice(pl, (dr + 1, dc + 1),
                           (dr + 1 + nrow, dc + 1 + ncol))
        diff = ds_sub(u, DS(nh, nl))
        acc = ds_add(acc, ds_mul_f32(diff, planes[k]))
    return acc


def _pad_even(x: jax.Array, fill=0.) -> jax.Array:
    nrow, ncol = x.shape[-2:]
    pr, pc = nrow % 2, ncol % 2
    if pr or pc:
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, pr), (0, pc)]
        x = jnp.pad(x, cfg, constant_values=fill)
    return x


def _galerkin_coarsen(planes: jax.Array) -> jax.Array:
    """Coarse difference-form planes: coarse edge (I -> J) weight is the
    sum of fine edges from block I into block J (RAP with piecewise-
    constant prolongation / block-sum restriction). Fine edges internal to
    a block vanish — they are invisible to block-constant functions."""
    wp = _pad_even(planes)
    m2, n2 = wp.shape[-2:]
    mc, nc = m2 // 2, n2 // 2
    coarse = [jnp.zeros((mc, nc), wp.dtype) for _ in range(8)]
    for k, (dr, dc) in enumerate(_DELTAS):
        for i in (0, 1):
            for j in (0, 1):
                di, dj = (i + dr) // 2, (j + dc) // 2
                if (di, dj) == (0, 0):
                    continue  # internal fine edge
                kc = _DELTA_TO_K[(di, dj)]
                coarse[kc] = coarse[kc] + wp[k][i::2, j::2]
    return jnp.stack(coarse)


def _coarsen_bmask(bmask: jax.Array) -> jax.Array:
    """Coarse cell is Dirichlet if any fine cell in its block is (the
    coarse correction must vanish there)."""
    bp = _pad_even(bmask.astype(jnp.float32))
    return (bp[::2, ::2] + bp[1::2, ::2] + bp[::2, 1::2]
            + bp[1::2, 1::2]) > 0.


def _restrict(r: jax.Array) -> jax.Array:
    """Block-sum restriction (adjoint of piecewise-constant
    prolongation)."""
    rp = _pad_even(r)
    return rp[::2, ::2] + rp[1::2, ::2] + rp[::2, 1::2] + rp[1::2, 1::2]


def _prolong_pc(e: jax.Array, fine_shape: Tuple[int, int]) -> jax.Array:
    """Piecewise-constant prolongation, cropped to the fine shape."""
    m, n = e.shape
    out = jnp.broadcast_to(e[:, None, :, None], (m, 2, n, 2))
    out = out.reshape(2 * m, 2 * n)
    return out[:fine_shape[0], :fine_shape[1]]


def coarsen_labels(labels: jax.Array, coarse_bmask: jax.Array
                   ) -> jax.Array:
    """Island-label coarsening: a coarse cell inherits the largest island
    label among its fine children (mixed island/plateau blocks count as
    island — the island part dominates the couplings), except where the
    coarse cell is Dirichlet. When distinct islands merge into one cell at
    deep levels, the union is still a valid 1-D deflation subspace for
    that level."""
    lab = _pad_even(jnp.asarray(labels, jnp.int32))
    lc = jnp.maximum(jnp.maximum(lab[::2, ::2], lab[1::2, ::2]),
                     jnp.maximum(lab[::2, 1::2], lab[1::2, 1::2]))
    return jnp.where(jnp.asarray(coarse_bmask, bool), 0, lc)


def build_lap_levels(planes: jax.Array, bmask: jax.Array,
                     labels=None, num_segments: int = 1,
                     min_size: int = 4) -> List[LapLevel]:
    """Static level hierarchy (shapes fixed at trace time), with island
    labels and deflation scalars carried per level. Coarsens down to
    ``min_size`` so islands collapse toward single coarse cells — at the
    level where an island is one cell, the Galerkin operator's contrast
    around it is gone and plain smoothing handles its neighborhood.

    Pure jnp (traceable): the whole hierarchy build runs inside the solve
    jit — the original host-side build (eager dispatch + per-level numpy
    ``island_zaz`` with device->host plane transfers) dominated warm-solve
    wall-clock."""
    levels = []
    mask = jnp.asarray(bmask, bool)
    if labels is None:
        labels = jnp.zeros(planes.shape[-2:], jnp.int32)
    labels = jnp.asarray(labels, jnp.int32)
    while True:
        diag = jnp.sum(planes, axis=0)
        dinv = jnp.where(diag > 0., 1. / jnp.where(diag > 0., diag, 1.), 0.)
        zaz = island_zaz(planes, labels, num_segments)
        levels.append(LapLevel(
            planes=planes, notb=(~mask).astype(jnp.float32), dinv=dinv,
            labels=labels,
            zaz_inv=(1.0 / zaz).astype(jnp.float32)))
        if min(planes.shape[-2:]) <= min_size:
            break
        planes = _galerkin_coarsen(planes)
        mask = _coarsen_bmask(mask)
        labels = coarsen_labels(labels, mask)
    return levels


def _smooth(level: LapLevel, u: jax.Array, rhs: jax.Array, omega: float,
            nsweeps: int) -> jax.Array:
    """Damped diagonally-scaled Jacobi on the difference form."""
    def body(_, u):
        r = rhs - _apply_lap(level.planes, u)
        return u + (omega * level.notb * level.dinv) * r
    return jax.lax.fori_loop(0, nsweeps, body, u)


def _deflate(level: LapLevel, u: jax.Array, rhs: jax.Array) -> jax.Array:
    """Island-subspace correction at this level:
    ``u += z_I (z_I^T r)/(z_I^T A z_I)`` for every island, one segment_sum.
    Applied at EVERY level of the cycle: island-level modes whose
    wavelength spans many islands are only multigrid-convergent if the
    coarse grids can move island levels too (measured: fine-level-only
    deflation leaves a ~0.99/cycle stall on 100+-island fields)."""
    r = (rhs - _apply_lap(level.planes, u)) * level.notb
    num = level.zaz_inv.shape[0]
    rsum = jax.ops.segment_sum(r.ravel(), level.labels.ravel(),
                               num_segments=num)
    c = (rsum * level.zaz_inv).at[0].set(0.)
    return u + c[level.labels] * level.notb


def vcycle(levels: List[LapLevel], rhs: jax.Array, u0: jax.Array,
           omega: float = 0.85, nu1: int = 2, nu2: int = 2,
           coarse_sweeps: int = 32, kappa: float = 2.0) -> jax.Array:
    """One deflated V-cycle for A u = rhs with u clamped (= 0 correction)
    at Dirichlet cells; recursion unrolled at trace time.

    ``kappa`` over-corrects the prolongated coarse update: the
    piecewise-constant-aggregated Galerkin operator is ~2x too stiff for
    smooth modes (their energy concentrates at aggregate jumps), and
    kappa = 2 compensates — measured on a uniform field at 460x460,
    asymptotic rate 0.91 (kappa 1) -> 0.69 (kappa 2)."""

    def cycle(idx: int, u: jax.Array, rhs: jax.Array) -> jax.Array:
        level = levels[idx]
        if idx == len(levels) - 1:
            u = _smooth(level, u, rhs, omega, coarse_sweeps)
            return _deflate(level, u, rhs)
        u = _smooth(level, u, rhs, omega, nu1)
        u = _deflate(level, u, rhs)
        r = (rhs - _apply_lap(level.planes, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = _restrict(r) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + kappa * _prolong_pc(e_c, level.shape) * level.notb
        u = _deflate(level, u, rhs)
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, u0, rhs)


# ---- island deflation -------------------------------------------------------


def island_labels(conductivity: np.ndarray, bmask: np.ndarray
                  ) -> Tuple[np.ndarray, int]:
    """Label floating high-conductivity islands (host side, once per
    solve).

    A component of ``cond > 0`` (8-connectivity, matching the stencil) is
    *anchored* — and excluded — when it contains or touches a Dirichlet
    cell that itself has ``cond > 0``: such a component couples to the
    boundary through O(1) harmonic means and is not ill-conditioned.
    Returns (labels int32 (nrow, ncol), 0 = background, 1..K floating
    islands; K).
    """
    from scipy import ndimage
    pos = np.asarray(conductivity) > 0.
    bmask = np.asarray(bmask, bool)
    structure = np.ones((3, 3), bool)
    lab, _ = ndimage.label(pos, structure=structure)
    strong_anchor = ndimage.binary_dilation(bmask & pos, structure=structure)
    anchored = np.unique(lab[strong_anchor & (lab > 0)])
    out = np.zeros_like(lab, dtype=np.int32)
    nxt = 0
    for lid in np.unique(lab[lab > 0]):
        if lid in anchored:
            continue
        nxt += 1
        out[lab == lid] = nxt
    return out, nxt


def island_zaz(planes: jax.Array, labels: jax.Array,
               num_segments: int) -> jax.Array:
    """z_I^T A z_I = total leak weight out of each island: the sum of
    W edges from island cells to cells with a different label. All terms
    are positive and tiny, so plain f32 summation is accurate. On device
    (one masked segment_sum over the stacked cross-edge planes)."""
    lab = jnp.asarray(labels, jnp.int32)
    nrow, ncol = lab.shape
    labpad = jnp.pad(lab, 1, constant_values=-1)
    cross_w = []
    for k, (dr, dc) in enumerate(_DELTAS):
        nb = jax.lax.slice(labpad, (dr + 1, dc + 1),
                           (dr + 1 + nrow, dc + 1 + ncol))
        cross = (lab > 0) & (nb != lab)
        cross_w.append(jnp.where(cross, planes[k], 0.))
    total = sum(cross_w)
    zaz = jax.ops.segment_sum(total.ravel(), lab.ravel(),
                              num_segments=num_segments)
    zaz = zaz.at[0].set(1.0)  # background: never used
    return jnp.maximum(zaz, 1e-30)


def _island_correction(u: DS, r_hi: jax.Array, labels: jax.Array,
                       zaz_inv: jax.Array, notb: jax.Array) -> DS:
    """Subspace correction u += z_I (z_I^T r)/(z_I^T A z_I) per island,
    vectorized over islands with one segment_sum."""
    num = zaz_inv.shape[0]
    rsum = jax.ops.segment_sum(r_hi.ravel(), labels.ravel(),
                               num_segments=num)
    c = rsum * zaz_inv
    c = c.at[0].set(0.)
    upd = c[labels] * notb
    return ds_add(u, ds_from(upd))


# ---- driver -----------------------------------------------------------------


_GCR_K = 3  # truncated-GCR history depth (Orthomin(k))


def _gcr_solve(levels: List[LapLevel], rhs: jax.Array, maxiter,
               tol_abs) -> jax.Array:
    """Solve A x = rhs (x clamped 0 at Dirichlet) by truncated flexible
    GCR preconditioned with one deflated V-cycle per iteration.

    Stationary deflated cycles alone stall at ~0.99/cycle on large
    many-island fields (measured at 460x460: the leftover slow modes are
    long-wavelength plateau/island-level combinations that neither
    piecewise-constant coarse grids nor per-island deflation represent);
    a k=3 Krylov history restores fast, roughly mesh-independent
    convergence (~0.8/iteration on the same field). Inner products are
    taken in the D^-1-weighted norm so plateau rows (D ~ 1e-8) are not
    invisible next to island rows (D ~ 1).
    """
    top = levels[0]
    notb = top.notb
    dinv2 = top.dinv * top.dinv

    def sdot(a, b):
        return jnp.vdot(a * dinv2, b)

    def snorm(r):
        return jnp.linalg.norm(r * top.dinv)

    x0 = jnp.zeros_like(rhs)
    buf = jnp.zeros((_GCR_K,) + rhs.shape, rhs.dtype)

    def body(carry):
        x, Z, Q, it, _, rn_prev = carry
        r = (rhs - _apply_lap(top.planes, x)) * notb
        z = vcycle(levels, r, jnp.zeros_like(x)) * notb
        q = _apply_lap(top.planes, z) * notb

        def ortho(i, zq):
            z, q = zq
            beta = sdot(q, Q[i])
            return z - beta * Z[i], q - beta * Q[i]

        z, q = jax.lax.fori_loop(0, _GCR_K, ortho, (z, q))
        nrm2 = sdot(q, q)
        inv = jnp.where(nrm2 > 0, jax.lax.rsqrt(nrm2 + 1e-38), 0.)
        z, q = z * inv, q * inv
        alpha = sdot(r, q)
        x = x + alpha * z
        Z = jnp.concatenate([Z[1:], z[None]])
        Q = jnp.concatenate([Q[1:], q[None]])
        rn = snorm((rhs - _apply_lap(top.planes, x)) * notb)
        return x, Z, Q, it + 1, rn, rn_prev

    def cond(carry):
        x, Z, Q, it, rn, rn_prev = carry
        improving = (rn < 0.98 * rn_prev) | (it < 4)
        return (it < maxiter) & (rn > tol_abs) & improving

    init = (x0, buf, buf, jnp.asarray(0, jnp.int32),
            snorm(rhs), jnp.float32(jnp.inf))
    x, _, _, _, rn, _ = jax.lax.while_loop(cond, body, init)
    return x, rn


@functools.partial(jax.jit,
                   static_argnames=('maxcycles', 'refine', 'tol',
                                    'num_segments'))
def _solve_refined_jit(conductivity, bmask, bvals, fine_labels,
                       num_segments: int,
                       tol: float, maxcycles: int, refine: int):
    bmask = jnp.asarray(bmask, bool)
    bvals = jnp.asarray(bvals, jnp.float32)
    planes = weight_planes(conductivity)
    levels = build_lap_levels(planes, bmask, labels=fine_labels,
                              num_segments=num_segments)
    top = levels[0]
    notb = top.notb
    labels, zaz_inv = top.labels, top.zaz_inv
    num = zaz_inv.shape[0]
    u0 = jnp.where(bmask, bvals, 500.)

    # All norms are of the diagonally-SCALED residual D^-1 r: in plateau
    # rows (D ~ 8e-8) and island rows alike, the error has sensitivity
    # ~1/D to the raw residual, so an unscaled norm exits with O(100)
    # errors hiding behind 1e-6 residual entries (measured during
    # development). D^-1 r is in potential units.
    def scaled_norm(r_hi):
        return jnp.linalg.norm(r_hi * top.dinv)

    scale = scaled_norm(-_apply_lap(top.planes, u0) * notb) + 1e-30
    target = tol * scale
    # island level-error estimate |z^T r| / (z^T A z), potential units
    lev_target = jnp.float32(1e-4)

    def island_update(r_hi):
        rsum = jax.ops.segment_sum(r_hi.ravel(), labels.ravel(),
                                   num_segments=num)
        c = (rsum * zaz_inv).at[0].set(0.)
        return c[labels] * notb, jnp.max(jnp.abs(c))

    # ---- stage 1: f32 GCR to the f32 floor (difference-form f32
    # residuals are accurate relative to their terms).
    r0 = -_apply_lap(top.planes, u0) * notb
    du, _ = _gcr_solve(levels, r0, maxcycles, target)
    u = u0 + du * notb

    # ---- stage 2: double-single refinement; the island deflation runs
    # LAST in each pass so the exit state has exact island levels up to
    # DS residual accuracy.
    uds = DS(u, jnp.zeros_like(u))

    def ds_resid(uds):
        r = apply_lap_ds(top.planes, uds)
        return -(r.hi + r.lo) * notb

    def ref_cond(carry):
        uds, it, rnorm, lev = carry
        return (it < refine) & ((rnorm > target) | (lev > lev_target))

    def ref_body(carry):
        uds, it, _, _ = carry
        r_hi = ds_resid(uds)
        delta, _ = _gcr_solve(levels, r_hi, 8, 0.05 * scaled_norm(r_hi))
        uds = ds_add(uds, ds_from(delta * notb))
        r_hi = ds_resid(uds)
        upd, _ = island_update(r_hi)
        uds = ds_add(uds, ds_from(upd))
        r_hi = ds_resid(uds)
        _, lev = island_update(r_hi)
        return uds, it + 1, scaled_norm(r_hi), lev

    uds, nref, rn2, _ = jax.lax.while_loop(
        ref_cond, ref_body,
        (uds, jnp.asarray(0, jnp.int32), scale, jnp.float32(jnp.inf)))

    out = uds.hi + uds.lo
    out = jnp.where(bmask, bvals, out)
    return out.astype(jnp.float32), rn2 / scale


def solve_potential_refined(conductivity, bmask, bvals, tol: float = 1e-7,
                            maxcycles: int = 60, refine: int = 30):
    """Solve the reference directional-potential system on device to f64-
    oracle accuracy (validated in tests/test_potential.py). Returns
    (potential float32 (nrow, ncol), relative residual scalar).

    Host work per solve is ONE ``scipy.ndimage.label`` pass; the weight
    planes, the whole Galerkin/deflation hierarchy, and the solve run in
    a single jit (compiled once per (shape, island-bucket) pair)."""
    bmask_np = np.asarray(bmask, bool)
    labels_np, k = island_labels(np.asarray(conductivity), bmask_np)
    # quantize the segment count so recompiles are rare across fields
    num = 64
    while num < k + 1:
        num *= 2
    return _solve_refined_jit(
        jnp.asarray(conductivity, jnp.float32), jnp.asarray(bmask_np),
        jnp.asarray(bvals, jnp.float32), jnp.asarray(labels_np), num,
        tol, maxcycles, refine)

"""Geometric multigrid for the directional-potential system.

The reference factorizes the 300k x 300k sparse system with SuperLU on the
host (ssrs/movmodel.py:113-121). A direct factorization does not map to the
TPU; instead we solve the same row-normalized 9-point system

    L u = u - (1 - bmask) * (P u) = bmask * bvals

with a cell-centered geometric V-cycle (weighted-Jacobi smoothing, 2x2
block-average restriction, piecewise-constant prolongation, rediscretized
coarse operators from block-averaged conductivity) used either standalone or
as a preconditioner for GMRES. Everything is shifted elementwise stencil
arithmetic — VPU-friendly, no gathers, no dot-product breakdowns in f32
(plain BiCGStab NaNs out on thresholded-updraft conductivity fields whose
edge weights span 1e-8..1).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .solver import _apply_p, transition_planes


class MGLevel(NamedTuple):
    p_planes: jax.Array   # (8, nrow, ncol) row-normalized transitions
    notb: jax.Array       # (nrow, ncol) 1.0 where NOT Dirichlet
    shape: Tuple[int, int]


def _block_sum(x: jax.Array) -> jax.Array:
    """2x2/2 reduce_window — stride-2 slices lane-shuffle on TPU
    (~200 ms at 16.8M cells, measured in scripts/exp_rp.py)."""
    return jax.lax.reduce_window(x, 0., jax.lax.add, (2, 2), (2, 2),
                                 'VALID')


def _coarsen_field(x: jax.Array) -> jax.Array:
    """2x2 block average; odd trailing row/col replicated first."""
    nrow, ncol = x.shape
    if nrow % 2:
        x = jnp.concatenate([x, x[-1:, :]], axis=0)
    if ncol % 2:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
    return 0.25 * _block_sum(x)


def _coarsen_mask(bmask: jax.Array) -> jax.Array:
    """A coarse cell is Dirichlet if any fine cell in its block is."""
    nrow, ncol = bmask.shape
    if nrow % 2:
        bmask = jnp.concatenate([bmask, bmask[-1:, :]], axis=0)
    if ncol % 2:
        bmask = jnp.concatenate([bmask, bmask[:, -1:]], axis=1)
    return _block_sum(bmask.astype(jnp.float32)) > 0.


def _prolong(e: jax.Array, fine_shape: Tuple[int, int]) -> jax.Array:
    """Cell-centered bilinear prolongation back to the fine grid
    (9/16-3/16-3/16-1/16 stencil; measurably better V-cycle rates than
    piecewise-constant injection)."""
    ep = jnp.pad(e, 1, mode='edge')
    c = ep[1:-1, 1:-1]
    up, down = ep[:-2, 1:-1], ep[2:, 1:-1]
    left, right = ep[1:-1, :-2], ep[1:-1, 2:]
    ul, ur = ep[:-2, :-2], ep[:-2, 2:]
    dl, dr = ep[2:, :-2], ep[2:, 2:]
    f00 = (9. * c + 3. * up + 3. * left + ul) * (1. / 16.)
    f01 = (9. * c + 3. * up + 3. * right + ur) * (1. / 16.)
    f10 = (9. * c + 3. * down + 3. * left + dl) * (1. / 16.)
    f11 = (9. * c + 3. * down + 3. * right + dr) * (1. / 16.)
    m, n = e.shape
    # interleave via 0/1 selector matmuls (MXU): the stack/transpose/
    # reshape formulation interleaves the 128-lane minor axis
    P = jax.lax.Precision.HIGHEST

    def sel(m2, mm, parity):
        r = jax.lax.broadcasted_iota(jnp.int32, (m2, mm), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (m2, mm), 1)
        return ((r % 2 == parity) & (r // 2 == c)).astype(e.dtype)

    out = jnp.zeros((2 * m, 2 * n), e.dtype)
    for (a, b), f in (((0, 0), f00), ((0, 1), f01),
                      ((1, 0), f10), ((1, 1), f11)):
        ra = sel(2 * m, m, a)
        cb = sel(2 * n, n, b)
        out = out + jnp.matmul(jnp.matmul(ra, f, precision=P), cb.T,
                               precision=P)
    return out[:fine_shape[0], :fine_shape[1]]


def build_levels(conductivity: jax.Array, bmask: jax.Array,
                 min_size: int = 8) -> List[MGLevel]:
    """Build the level hierarchy (shapes are static at trace time)."""
    levels = []
    cond = jnp.asarray(conductivity, jnp.float32)
    mask = jnp.asarray(bmask, bool)
    while True:
        planes = transition_planes(cond)
        levels.append(MGLevel(p_planes=planes,
                              notb=(~mask).astype(jnp.float32),
                              shape=cond.shape))
        if min(cond.shape) <= min_size:
            break
        cond = _coarsen_field(cond)
        mask = _coarsen_mask(mask)
    return levels


def _smooth(level: MGLevel, u: jax.Array, rhs: jax.Array, omega: float,
            nsweeps: int) -> jax.Array:
    """Weighted Jacobi: diag(L) == 1, so u += omega * (rhs - L u)."""
    def body(_, u):
        residual = rhs - (u - level.notb * _apply_p(level.p_planes, u))
        return u + omega * residual
    return jax.lax.fori_loop(0, nsweeps, body, u)


def _residual(level: MGLevel, u: jax.Array, rhs: jax.Array) -> jax.Array:
    return rhs - (u - level.notb * _apply_p(level.p_planes, u))


def vcycle(levels: List[MGLevel], rhs: jax.Array, u0: jax.Array,
           omega: float = 0.8, nu1: int = 2, nu2: int = 2,
           coarse_sweeps: int = 64) -> jax.Array:
    """One V-cycle on L u = rhs. Recursion is unrolled at trace time (the
    hierarchy depth is static)."""

    def cycle(idx: int, u: jax.Array, rhs: jax.Array) -> jax.Array:
        level = levels[idx]
        if idx == len(levels) - 1:
            return _smooth(level, u, rhs, omega, coarse_sweeps)
        u = _smooth(level, u, rhs, omega, nu1)
        r = _residual(level, u, rhs)
        coarse = levels[idx + 1]
        r_c = _coarsen_field(r) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + _prolong(e_c, level.shape) * level.notb
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, u0, rhs)


@functools.partial(jax.jit, static_argnames=('tol', 'maxcycles'))
def solve_potential_mg(conductivity: jax.Array, bmask: jax.Array,
                       bvals: jax.Array, tol: float = 1e-6,
                       maxcycles: int = 200):
    """Solve for the directional potential with V-cycle iteration.

    Runs V-cycles until ||r|| <= tol * ||rhs|| or ``maxcycles``. Returns
    (potential float32, final residual norm).
    """
    bmask = jnp.asarray(bmask, bool)
    bvals = jnp.asarray(bvals, jnp.float32)
    levels = build_levels(conductivity, bmask)
    rhs = jnp.where(bmask, bvals, 0.)
    target = tol * jnp.linalg.norm(rhs)

    u0 = jnp.where(bmask, bvals, 500.)

    def cond_fn(carry):
        u, it, rnorm = carry
        return (it < maxcycles) & (rnorm > target)

    def body_fn(carry):
        u, it, _ = carry
        u = vcycle(levels, rhs, u)
        rnorm = jnp.linalg.norm(_residual(levels[0], u, rhs))
        return u, it + 1, rnorm

    r0 = jnp.linalg.norm(_residual(levels[0], u0, rhs))
    u, _, rnorm = jax.lax.while_loop(cond_fn, body_fn,
                                     (u0, jnp.asarray(0, jnp.int32), r0))
    u = jnp.where(bmask, bvals, u)
    return u.astype(jnp.float32), rnorm

"""BoxMG / operator-dependent-transfer experiments — the measured
negative result for VERDICT r2 item 2 (full narrative in docs/DESIGN.md,
"Operator-dependent (BoxMG) transfers: a measured negative result").

Consolidates the round-3 experiment series (exp_bmg_check/lmax/gcr/
scaled/mixed/f64/debug*, full versions at git 7edc3da). Three parts:

1. ``check``  — dense-algebra validation of the transfers on tiny grids:
   P row sums, galerkin_rap == offdiag(P^T A P) entrywise, prolong/
   restrict == dense P / P^T. (The transfers are CORRECT; the failure
   is numerical, not algebraic.)
2. ``rates``  — GCR rates of the Jacobi-normalized (scaled) BoxMG cycle
   vs the production pc hierarchy, in both metrics, on both rhs types.
   Reproduces the decisive table: scaled-bmg is 0.3-0.45/iter in the
   D^-1/2 metric on random rhs, but stalls (alpha ~ 0) in the
   production D^-1 metric on the physical boundary-driven rhs.
3. ``noise``  — the root cause in one number: a single scaled-cycle
   application GROWS the D^-1-weighted residual ~30x (weak-row garbage
   ~1e4 x its own f32 floor), because the true weak-row solution values
   sit below the scaled representation's noise floor.

Historical context from the raw-operator (unscaled) BoxMG series (git
7edc3da, needs that revision to rerun):
  - per-level Jacobi omega from power iteration is REQUIRED
    (lambda_max(D^-1 A) up to 3.0 on Galerkin coarse levels);
  - exact (unclipped) Galerkin s_c is REQUIRED (a 1e-4-relative sweep
    turned a contracting f64 cycle into 3.7x/iter divergence);
  - with both fixes, f64 all-level-deflated bmg reached GCR 0.742/iter
    at 256^2 (pc: 0.912) — but every f32 variant failed: all-level
    deflation NaN (island zaz <= 0 from probing noise), f64-build +
    f32-cycle 0.93, finest-only deflation 0.89.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument('part', nargs='?', default='all',
                    choices=['all', 'check', 'rates', 'noise'])
parser.add_argument('--tpu', action='store_true')
parser.add_argument('--sizes', type=str, default='256,460')
parser.add_argument('--iters', type=int, default=24)
args = parser.parse_args()

if not args.tpu:
    os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

if not args.tpu:
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from scripts.bmg_lib import (_P_DELTAS, build_scaled_levels, coarse_shape,
                             galerkin_rap, interp_planes, precond_scaled,
                             prolong_bmg, restrict_bmg)
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import (_DELTAS, _apply_lap, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    vcycle, weight_planes)


def hard_conductivity(shape, seed=1):
    """The hard speckle class (matches tests/test_potential.py
    _conductivity_hard): thresholded-updraft-like, zero plateaus."""
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


# ---- part 1: dense algebra --------------------------------------------------


def dense_P(pw, fine_shape):
    m, n = fine_shape
    mc, nc = coarse_shape(fine_shape)
    P = np.zeros((m * n, mc * nc))
    pw = np.asarray(pw)
    for k, (dr, dc) in enumerate(_P_DELTAS):
        for r in range(m):
            for c in range(n):
                rr, cc = r + dr, c + dc
                if 0 <= rr < m and 0 <= cc < n and rr % 2 == 0 \
                        and cc % 2 == 0:
                    P[r * n + c, (rr // 2) * nc + cc // 2] = pw[k, r, c]
    return P


def dense_A(planes, shape):
    m, n = shape
    planes = np.asarray(planes)
    A = np.zeros((m * n, m * n))
    for k, (dr, dc) in enumerate(_DELTAS):
        for r in range(m):
            for c in range(n):
                rr, cc = r + dr, c + dc
                w = planes[k, r, c]
                A[r * n + c, r * n + c] += w
                if 0 <= rr < m and 0 <= cc < n:
                    A[r * n + c, rr * n + cc] -= w
    return A


def check_small(shape=(9, 11), dirn=225.):
    cond = hard_conductivity(shape, seed=3)
    bmask, _ = boundary_masks(dirn, shape)
    bmask = np.asarray(bmask)
    planes = weight_planes(cond)
    pw = interp_planes(planes, jnp.asarray(bmask))

    P = dense_P(pw, shape)
    rows = P.sum(axis=1).reshape(shape)
    interior = ~bmask
    assert np.allclose(rows[interior & (rows.reshape(shape) > 0)], 1.,
                       atol=1e-6)
    assert np.allclose(rows[bmask], 0.)
    print(f'{shape} d{dirn}: P row sums ok; zero interior rows:',
          int((rows[interior] == 0).sum()), '/', int(interior.sum()))

    A = dense_A(planes, shape)
    Ac_true = P.T @ A @ P
    mc, nc = coarse_shape(shape)
    wc_j, sc_j = galerkin_rap(planes, pw)
    wc, sc = np.asarray(wc_j), np.asarray(sc_j)
    for k, (dr, dc) in enumerate(_DELTAS):
        for r in range(mc):
            for c in range(nc):
                rr, cc = r + dr, c + dc
                want = (-Ac_true[r * nc + c, rr * nc + cc]
                        if 0 <= rr < mc and 0 <= cc < nc else 0.)
                got = wc[k, r, c]
                assert abs(got - want) < 1e-4 * max(1., abs(want)), \
                    (k, r, c, got, want)
    diag_true = np.diag(Ac_true).reshape(mc, nc)
    diag_impl = wc.sum(axis=0) + sc
    floor = 1e-6 * np.abs(diag_true).max()
    dev = np.abs(diag_impl - diag_true) / np.maximum(np.abs(diag_true),
                                                     floor)
    assert dev.max() < 2e-3, dev.max()
    print('  RAP entrywise ok; diag rel dev:', float(dev.max()))

    rng = np.random.default_rng(0)
    e = rng.random((mc, nc)).astype(np.float32)
    r = rng.random(shape).astype(np.float32)
    pe = np.asarray(prolong_bmg(jnp.asarray(e), pw, shape))
    assert np.allclose(pe.ravel(), P @ e.ravel(), atol=1e-5)
    rr_ = np.asarray(restrict_bmg(jnp.asarray(r), pw))
    assert np.allclose(rr_.ravel(), P.T @ r.ravel(), atol=1e-5)
    print('  prolong/restrict == dense P / P^T ok')


# ---- shared harness ---------------------------------------------------------


def setup(shape, dirn=0., seed=1):
    cond = hard_conductivity(shape, seed=seed)
    bmask_np, bvals = (np.asarray(x) for x in boundary_masks(dirn, shape))
    labels_np, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    tiles = build_tile_hierarchy(labels_np, bmask_np)
    bmask = jnp.asarray(bmask_np)
    planes = weight_planes(jnp.asarray(cond, jnp.float32))
    levels = build_lap_levels(planes, bmask, tiles, num)
    blev, pws, dsi = build_scaled_levels(planes, bmask)
    u0 = jnp.where(bmask, jnp.asarray(bvals, jnp.float32), 500.)
    rhs_bdry = -_apply_lap(planes, u0) * levels[0].notb
    rng = np.random.default_rng(0)
    rhs_rand = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * levels[0].notb
    return levels, (blev, pws, dsi), rhs_bdry, rhs_rand, k


def gcr(top, pre, rhs, niter, metric):
    """Truncated GCR (Orthomin(3)); metric 'd1' = production D^-1,
    'dh' = D^-1/2 (the scaled cycle's natural norm)."""
    notb = top.notb
    w = top.dinv if metric == 'd1' else jnp.sqrt(top.dinv)

    def sdot(a, b):
        return jnp.vdot(a * w * w, b)

    @jax.jit
    def step(x, Z, Q):
        r = (rhs - _apply_lap(top.planes, x)) * notb
        z = pre(r) * notb
        q = _apply_lap(top.planes, z) * notb

        def ortho(i, zq):
            z, q = zq
            b = sdot(q, Q[i])
            return z - b * Z[i], q - b * Q[i]

        z, q = jax.lax.fori_loop(0, 3, ortho, (z, q))
        n2 = sdot(q, q)
        inv = jnp.where(n2 > 0, jax.lax.rsqrt(n2 + 1e-38), 0.)
        z, q = z * inv, q * inv
        x = x + sdot(r, q) * z
        Z = jnp.concatenate([Z[1:], z[None]])
        Q = jnp.concatenate([Q[1:], q[None]])
        rn = jnp.linalg.norm((rhs - _apply_lap(top.planes, x)) * notb
                             * top.dinv)
        return x, Z, Q, rn

    x = jnp.zeros_like(rhs)
    buf = jnp.zeros((3,) + rhs.shape, rhs.dtype)
    Z = Q = buf
    rns = [float(jnp.linalg.norm(rhs * top.dinv))]
    for _ in range(niter):
        x, Z, Q, rn = step(x, Z, Q)
        rns.append(float(rn))
    return rns


def asym(rns, k=10):
    rel = [r / rns[0] for r in rns if rns[0] > 0]
    tail = [rel[i + 1] / rel[i] for i in range(len(rel) - k - 1,
                                               len(rel) - 1) if rel[i] > 0]
    return math.prod(tail) ** (1 / len(tail)) if tail else float('nan')


def rates(shape, niter):
    levels, (blev, pws, dsi), rhs_bdry, rhs_rand, k = setup(shape)
    top = levels[0]
    pre_pc = lambda r: vcycle(levels, r, jnp.zeros_like(r))
    pre_bmg = lambda r: precond_scaled(blev, pws, dsi, r)
    print(f'{shape} islands={k} (D^-1 rrel@{niter} / asym(last10)):')
    for name, pre, metric in (('pc   d1-metric', pre_pc, 'd1'),
                              ('bmg  d1-metric', pre_bmg, 'd1'),
                              ('bmg  dh-metric', pre_bmg, 'dh')):
        for rhs_name, rhs in (('bdry', rhs_bdry), ('rand', rhs_rand)):
            rns = gcr(top, pre, rhs, niter, metric)
            print(f'  {name} rhs={rhs_name}: {rns[-1] / rns[0]:.2e} / '
                  f'{asym(rns):.3f}')


def noise(shape):
    levels, (blev, pws, dsi), rhs_bdry, _, k = setup(shape)
    top = levels[0]
    snorm = lambda r: float(jnp.linalg.norm(r * top.dinv))
    z = precond_scaled(blev, pws, dsi, rhs_bdry) * top.notb
    r1 = (rhs_bdry - _apply_lap(top.planes, z)) * top.notb
    zp = vcycle(levels, rhs_bdry, jnp.zeros_like(rhs_bdry)) * top.notb
    r1p = (rhs_bdry - _apply_lap(top.planes, zp)) * top.notb
    # scaled-space view of the same application
    rh = dsi * rhs_bdry
    from scripts.bmg_lib import apply_bmg, vcycle_scaled
    eh = vcycle_scaled(blev, pws, rh, jnp.zeros_like(rh))
    rh1 = (rh - apply_bmg(blev[0], eh)) * blev[0].notb
    print(f'{shape}: one preconditioner application on the physical rhs')
    print(f'  D^-1 norm:   {snorm(rhs_bdry):.4g} -> bmg {snorm(r1):.4g} '
          f'(pc: {snorm(r1p):.4g})')
    print(f'  D^-1/2 norm (scaled system): '
          f'{float(jnp.linalg.norm(rh)):.4g} -> '
          f'{float(jnp.linalg.norm(rh1)):.4g}')
    print('  => the scaled cycle is excellent in ITS norm and injects '
          'weak-row garbage in the production one.')


if __name__ == '__main__':
    if args.part in ('all', 'check'):
        check_small((9, 11), 225.)
        check_small((10, 12), 0.)
        check_small((8, 8), 90.)
    sizes = [int(s) for s in args.sizes.split(',')]
    if args.part in ('all', 'rates'):
        for n in sizes:
            rates((n, n), args.iters)
    if args.part in ('all', 'noise'):
        noise((sizes[-1], sizes[-1]))

"""Dense-algebra validation of the BoxMG transfers on tiny grids (CPU).

Checks, against dense numpy:
1. P rows sum to 1 on non-Dirichlet cells, 0 on Dirichlet cells.
2. galerkin_rap == offdiag(P^T A P) entrywise (and the implied diagonal
   equals the true Galerkin diagonal).
3. Stationary deflated V-cycle rate: bmg vs pc hierarchy on a hard field.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (_P_DELTAS, build_bmg_levels,
                                      build_tile_hierarchy_bmg,
                                      coarse_shape, galerkin_rap,
                                      interp_planes, prolong_bmg,
                                      restrict_bmg, vcycle_bmg)
from ssrs_tpu.potential.lap import (_DELTAS, _apply_lap, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    vcycle, weight_planes)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


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

    # 1. row sums
    P = dense_P(pw, shape)
    rows = P.sum(axis=1).reshape(shape)
    interior = ~bmask
    assert np.allclose(rows[interior & (rows.reshape(shape) > 0)], 1.,
                       atol=1e-6)
    assert np.allclose(rows[bmask], 0.)
    # every non-Dirichlet row must interpolate from something unless all
    # its parents are Dirichlet (then 0 <= sum < 1 is fine)
    print('row sums ok; zero interior rows:',
          int((rows[interior] == 0).sum()), '/', int(interior.sum()))

    # 2. RAP vs dense
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
    # implied diagonal + excess == true Galerkin diagonal
    diag_true = np.diag(Ac_true).reshape(mc, nc)
    diag_impl = wc.sum(axis=0) + sc
    # floor the normalizer: coarse plateau-corner cells can have
    # diag ~ 1e-15 (numerically zero), where relative dev is meaningless
    floor = 1e-6 * np.abs(diag_true).max()
    dev = np.abs(diag_impl - diag_true) / np.maximum(np.abs(diag_true),
                                                     floor)
    # the excess is deliberately swept to 0 below 1e-4*diag and clipped
    # at >= 0 (galerkin_rap docstring): a small relative perturbation of
    # the coarse operator, which only preconditions — the outer DS
    # refinement always uses the exact fine operator.
    assert dev.max() < 2e-3, dev.max()
    assert (sc >= 0).all()
    print('RAP entrywise ok; diag rel dev:', float(dev.max()),
          'excess cells:', int((sc > 0).sum()), '/', sc.size)

    # 3. prolong/restrict adjointness through dense P
    rng = np.random.default_rng(0)
    e = rng.random((mc, nc)).astype(np.float32)
    r = rng.random(shape).astype(np.float32)
    pe = np.asarray(prolong_bmg(jnp.asarray(e), pw, shape))
    assert np.allclose(pe.ravel(), P @ e.ravel(), atol=1e-5)
    rr_ = np.asarray(restrict_bmg(jnp.asarray(r), pw))
    assert np.allclose(rr_.ravel(), P.T @ r.ravel(), atol=1e-5)
    print('prolong/restrict == dense P / P^T ok')


def rate(shape=(128, 160), dirn=225., seed=1, ncyc=25):
    cond = hard_conductivity(shape, seed=seed)
    bmask, _ = boundary_masks(dirn, shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes = weight_planes(cond)

    tiles_pc = build_tile_hierarchy(labels, bmask_np)
    lev_pc = build_lap_levels(planes, jnp.asarray(bmask_np), tiles_pc, num)
    tiles_bmg = build_tile_hierarchy_bmg(labels, bmask_np)
    lev_bmg, pws = build_bmg_levels(planes, jnp.asarray(bmask_np),
                                    tiles_bmg, num)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * lev_pc[0].notb

    def run(cycle_fn):
        u = jnp.zeros(shape, jnp.float32)
        rates = []
        rn_prev = None
        for i in range(ncyc):
            u = cycle_fn(u)
            rn = float(jnp.linalg.norm(
                (rhs - _apply_lap(planes, u)) * lev_pc[0].notb
                * lev_pc[0].dinv))
            if rn_prev:
                rates.append(rn / rn_prev)
            rn_prev = rn
        return rates

    r_pc = run(lambda u: vcycle(lev_pc, rhs, u))
    r_bmg = run(lambda u: vcycle_bmg(lev_bmg, pws, rhs, u))
    print(f'{shape} islands={k}')
    print('  pc  last-5 rates:', [round(x, 3) for x in r_pc[-5:]])
    print('  bmg last-5 rates:', [round(x, 3) for x in r_bmg[-5:]])


if __name__ == '__main__':
    check_small((9, 11), 225.)
    check_small((10, 12), 0.)
    check_small((8, 8), 90.)
    for shape in [(128, 160), (256, 256)]:
        rate(shape)

"""K-cycle (Notay/AGMG-style Krylov-accelerated recursion) vs V-cycle.

The BoxMG route died on f32 scale-mixing (DESIGN.md "a measured negative
result"): any operator-dependent transfer rebuilds general Galerkin
stencils that mix O(1) and O(1e-8) scales in single rows. The K-cycle is
the opposite kind of lever — it changes NOTHING about operator storage
(difference form + pc aggregation stays scale-exact at every level) and
instead solves each coarse problem with `ks` steps of flexible GCR
preconditioned by the next-level cycle, instead of one stationary cycle
application. AGMG's published result is that pairwise-aggregation MG,
whose stationary rate is mediocre exactly like ours (~0.86), becomes
near-mesh-independent under K-cycle recursion.

Cost model: each level's cycle is invoked ks times by its parent, work
per level falls 4x per level, so total work <= finest * sum (ks/4)^l —
bounded by 2x for ks=2. Trace size also grows 2^l per level, so
`kdepth` bounds how many of the top levels get the Krylov treatment
(V-cycle below).

Measures the same quantity as exp_lap_kappa.py: outer-GCR tail rate on
the post-stage-1 DS-floor residual (the hard subspace) on the speckled
many-island field class, plus per-iteration wall time and compile time,
at several grid sizes.

Usage: python scripts/exp_kcycle.py [size] [size ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if '--cpu' in sys.argv:  # rate measurements are device-independent
    sys.argv.remove('--cpu')
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from ssrs_tpu.simulator import _enable_compile_cache

_enable_compile_cache()

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.ds import DS, ds_add, ds_from
from ssrs_tpu.potential.lap import (_GCR_K, _apply_lap, _deflate,
                                    _gcr_solve, _prolong_pc, _restrict,
                                    _smooth, apply_lap_ds,
                                    build_lap_levels, build_tile_hierarchy,
                                    island_labels, weight_planes)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def kcycle(levels, rhs, ks: int, kdepth: int, kappa, inner='d2'):
    """Deflated multigrid cycle with Krylov-accelerated recursion.

    Levels 0..kdepth-1 solve their coarse problem with `ks` steps of
    flexible GCR (full orthogonalization) preconditioned by the next
    level's cycle; below that it is the production V-cycle recursion.
    kappa: fixed prolongation scaling or 'auto' (energy line search).
    inner: metric of the coarse-level GCR dots — 'd2' (the production
    D^-1 residual norm; weights plateau rows ~1e16 over strong rows) or
    'none' (unweighted)."""
    omega, nu1, nu2, coarse_sweeps = 0.85, 2, 2, 32

    def coarse_solve(idx, rhs_c):
        """ks-step FGCR on levels[idx] preconditioned by cycle(idx)."""
        level = levels[idx]
        dinv2 = level.dinv * level.dinv

        def sdot(a, b):
            if inner == 'none':
                return jnp.vdot(a, b)
            return jnp.vdot(a * dinv2, b)

        e = jnp.zeros_like(rhs_c)
        zs, qs = [], []
        r = rhs_c
        for _ in range(ks):
            z = cycle(idx, jnp.zeros_like(r), r)
            q = _apply_lap(level.planes, z) * level.notb
            for zp, qp in zip(zs, qs):
                beta = sdot(q, qp)
                z, q = z - beta * zp, q - beta * qp
            nrm2 = sdot(q, q)
            inv = jnp.where(nrm2 > 0, jax.lax.rsqrt(nrm2 + 1e-38), 0.)
            z, q = z * inv, q * inv
            alpha = sdot(r, q)
            e = e + alpha * z
            r = r - alpha * q
            zs.append(z)
            qs.append(q)
        return e

    def cycle(idx, u, rhs):
        level = levels[idx]
        if idx == len(levels) - 1:
            u = _smooth(level, u, rhs, omega, coarse_sweeps)
            return _deflate(level, u, rhs)
        u = _smooth(level, u, rhs, omega, nu1)
        u = _deflate(level, u, rhs)
        r = (rhs - _apply_lap(level.planes, u)) * level.notb
        coarse = levels[idx + 1]
        r_c = _restrict(r) * coarse.notb
        if idx < kdepth:
            e_c = coarse_solve(idx + 1, r_c)
        else:
            e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        p = _prolong_pc(e_c, level.shape) * level.notb
        if kappa == 'auto':
            ap = _apply_lap(level.planes, p) * level.notb
            num = jnp.vdot(r, p)
            den = jnp.vdot(p, ap)
            alpha = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.),
                              1.)
            u = u + alpha * p
        else:
            u = u + kappa * p
        u = _deflate(level, u, rhs)
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, jnp.zeros_like(rhs), rhs)


@functools.partial(jax.jit, static_argnames=('num',))
def floor_rhs(cond, bmask, bvals, tiles, num: int):
    """Stage-1 solve to the f32 floor; returns the DS-floor residual —
    the hard subspace the refinement loop actually grinds on."""
    bmask = jnp.asarray(bmask, bool)
    bvals = jnp.asarray(bvals, jnp.float32)
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    u0 = jnp.where(bmask, bvals, 500.)

    def snorm(r):
        return jnp.linalg.norm(r * top.dinv)

    r0 = -_apply_lap(top.planes, u0) * notb
    scale = snorm(r0) + 1e-30
    du, _ = _gcr_solve(levels, r0, 60, 1e-7 * scale)
    u = u0 + du * notb
    uds = DS(u, jnp.zeros_like(u))
    r = apply_lap_ds(top.planes, uds)
    return -(r.hi + r.lo) * notb


@functools.partial(jax.jit, static_argnames=('num', 'niter', 'ks',
                                             'kdepth', 'kappa', 'inner'))
def trace(cond, bmask, rhs, tiles, num: int, niter: int, ks: int,
          kdepth: int, kappa, inner='d2'):
    """Outer truncated-FGCR residual trajectory with the variant cycle
    as preconditioner (same scaffold as the production _gcr_solve)."""
    bmask = jnp.asarray(bmask, bool)
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    dinv2 = top.dinv * top.dinv

    def snorm(r):
        return jnp.linalg.norm(r * top.dinv)

    def sdot(a, b):
        return jnp.vdot(a * dinv2, b)

    x0 = jnp.zeros_like(rhs)
    buf = jnp.zeros((_GCR_K,) + rhs.shape, rhs.dtype)

    def body(carry, it):
        x, Z, Q = carry
        r = (rhs - _apply_lap(top.planes, x)) * notb
        if ks == 0:
            z = kcycle(levels, r, 2, -1, kappa) * notb  # plain V
        else:
            z = kcycle(levels, r, ks, kdepth, kappa, inner) * notb
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
        return (x, Z, Q), snorm((rhs - _apply_lap(top.planes, x)) * notb)

    (_, _, _), norms = jax.lax.scan(body, (x0, buf, buf),
                                    jnp.arange(niter))
    return norms / snorm(rhs)


def run_size(n, variants, niter=24):
    shape = (n, n)
    print(f'--- shape={shape}', flush=True)
    cond = hard_conductivity(shape)
    bmask, bvals = boundary_masks(0., shape)
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1:
        num *= 2
    tiles = build_tile_hierarchy(labels, bmask)
    cj, bj = jnp.asarray(cond), jnp.asarray(bmask)
    vj = jnp.asarray(bvals, jnp.float32)
    rhs = floor_rhs(cj, bj, vj, tiles, num)
    rhs = jax.block_until_ready(rhs)

    for (ks, kdepth, kappa, inner) in variants:
        t0 = time.perf_counter()
        norms = np.asarray(trace(cj, bj, rhs, tiles, num, niter, ks,
                                 kdepth, kappa, inner))
        t1 = time.perf_counter()
        norms2 = np.asarray(trace(cj, bj, rhs, tiles, num, niter, ks,
                                  kdepth, kappa, inner))
        t2 = time.perf_counter()
        tail = (norms[-1] / norms[-9]) ** 0.125
        label = 'V-cycle ' if ks == 0 else f'K ks={ks} d={kdepth}'
        print(f'{label} kappa={kappa!s:4s} in={inner:4s}  '
              f'res{niter} {norms[-1]:.3e}  '
              f'tail-rate {tail:.3f}  warm {t2 - t1:6.2f}s  '
              f'(compile+run {t1 - t0:6.1f}s)  '
              f'traj {np.array2string(norms[::6], precision=2)}',
              flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [460]
    print(f'device: {jax.devices()[0]}', flush=True)
    variants = [
        (0, 0, 2.0, 'd2'),     # production V-cycle baseline
        (2, 2, 2.0, 'd2'),     # best 2048 variant so far
        (2, 2, 2.0, 'none'),   # unweighted inner dots
        (3, 2, 2.0, 'none'),
        (2, 4, 2.0, 'none'),
    ]
    for n in sizes:
        run_size(n, variants)


if __name__ == '__main__':
    main()

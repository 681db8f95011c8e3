"""Coarse-correction scaling variants measured on the HARD subspace (the
post-stage-1 DS-floor residual at 2048^2): fixed kappa in {1, 1.5, 2} vs
energy-optimal per-level line search ('auto': alpha = <r,p>/<p,Ap>).

Hypothesis: island-level fields are exactly representable under pc
aggregation, so their coarse correction is near-exact and kappa=2 flips
their error (rate ~ 1) — while smooth modes need kappa~2. A per-level
line search serves both.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
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

SHAPE = (2048, 2048)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def variant_cycle(levels, rhs, kappa):
    """kappa: float (may be traced) for fixed scaling, 'auto' for
    per-level energy line search of the prolonged correction."""
    omega, nu1, nu2, coarse_sweeps = 0.85, 2, 2, 32

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


@functools.partial(jax.jit, static_argnames=('num', 'niter', 'kappa'))
def trace(cond, bmask, bvals, tiles, num: int, niter: int, kappa):
    bmask = jnp.asarray(bmask, bool)
    bvals = jnp.asarray(bvals, jnp.float32)
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    dinv2 = top.dinv * top.dinv
    u0 = jnp.where(bmask, bvals, 500.)

    def snorm(r):
        return jnp.linalg.norm(r * top.dinv)

    def sdot(a, b):
        return jnp.vdot(a * dinv2, b)

    scale = snorm(-_apply_lap(top.planes, u0) * notb) + 1e-30
    r0 = -_apply_lap(top.planes, u0) * notb
    du, _ = _gcr_solve(levels, r0, 60, 1e-7 * scale)
    u = u0 + du * notb
    uds = DS(u, jnp.zeros_like(u))
    r = apply_lap_ds(top.planes, uds)
    rhs = -(r.hi + r.lo) * notb

    x0 = jnp.zeros_like(rhs)
    buf = jnp.zeros((_GCR_K,) + rhs.shape, rhs.dtype)

    def body(carry, it):
        x, Z, Q = carry
        r = (rhs - _apply_lap(top.planes, x)) * notb
        if kappa == 'alt':
            kap = jnp.where(it % 2 == 0, 1.0, 2.0)
            z = variant_cycle(levels, r, kap) * notb
        elif kappa == 'comp':
            z1 = variant_cycle(levels, r, 1.0) * notb
            r2 = (r - _apply_lap(top.planes, z1)) * notb
            z = z1 + variant_cycle(levels, r2, 2.0) * notb
        else:
            z = variant_cycle(levels, r, kappa) * notb
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


def main():
    print(f'device: {jax.devices()[0]}  shape={SHAPE}', flush=True)
    cond = hard_conductivity(SHAPE)
    bmask, bvals = boundary_masks(0., SHAPE)
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1:
        num *= 2
    tiles = build_tile_hierarchy(labels, bmask)
    cj, bj = jnp.asarray(cond), jnp.asarray(bmask)
    vj = jnp.asarray(bvals, jnp.float32)

    for kappa in ('alt', 'comp'):
        norms = np.asarray(trace(cj, bj, vj, tiles, num, 24, kappa))
        tail = (norms[-1] / norms[-9]) ** 0.125
        print(f'kappa={kappa!s:5s} res24 {norms[-1]:.3e}  tail-rate '
              f'{tail:.3f}  traj {np.array2string(norms[::4], precision=2)}',
              flush=True)


if __name__ == '__main__':
    main()

"""Smoothed-prolongation variants on the HARD subspace (post-stage-1
DS-floor residual, 2048^2 hard speckle field): apply the coarse
correction through P = (I - omega D^-1 A) P_pc (and optionally restrict
through its transpose), keeping the pc-Galerkin coarse operators.

The kappa=2 over-correction compensates pc aggregation's 2x stiffness
for smooth modes but flips exactly-representable modes (measured:
kappa sweep in exp_lap_kappa.py). Jacobi-smoothing the prolongated
correction removes the aggregate-boundary jump energy directly, which
should serve both subspaces with kappa ~ 1.
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
from ssrs_tpu.potential.ds import DS
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


def variant_cycle(levels, rhs, kappa, omega_p, smooth_r):
    """omega_p > 0: prolong through (I - omega_p D^-1 A) P_pc.
    smooth_r: restrict through the transpose smoother too."""
    omega, nu1, nu2, coarse_sweeps = 0.85, 2, 2, 32

    def smooth_vec(level, v):
        return v - omega_p * (level.notb * level.dinv) * _apply_lap(
            level.planes, v)

    def cycle(idx, u, rhs):
        level = levels[idx]
        if idx == len(levels) - 1:
            u = _smooth(level, u, rhs, omega, coarse_sweeps)
            return _deflate(level, u, rhs)
        u = _smooth(level, u, rhs, omega, nu1)
        u = _deflate(level, u, rhs)
        r = (rhs - _apply_lap(level.planes, u)) * level.notb
        coarse = levels[idx + 1]
        rr = smooth_vec(level, r) * level.notb if smooth_r else r
        r_c = _restrict(rr) * coarse.notb
        e_c = cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        p = _prolong_pc(e_c, level.shape) * level.notb
        if omega_p > 0:
            p = smooth_vec(level, p) * level.notb
        u = u + kappa * p
        u = _deflate(level, u, rhs)
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, jnp.zeros_like(rhs), rhs)


@functools.partial(jax.jit, static_argnames=(
    'num', 'niter', 'kappa', 'omega_p', 'smooth_r', 'hard_rhs'))
def trace(cond, bmask, bvals, tiles, num: int, niter: int, kappa,
          omega_p, smooth_r, hard_rhs: bool):
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
    if hard_rhs:
        du, _ = _gcr_solve(levels, r0, 60, 1e-7 * scale)
        u = u0 + du * notb
        uds = DS(u, jnp.zeros_like(u))
        r = apply_lap_ds(top.planes, uds)
        rhs = -(r.hi + r.lo) * notb
    else:
        rhs = r0

    x0 = jnp.zeros_like(rhs)
    buf = jnp.zeros((_GCR_K,) + rhs.shape, rhs.dtype)

    def body(carry, it):
        x, Z, Q = carry
        r = (rhs - _apply_lap(top.planes, x)) * notb
        z = variant_cycle(levels, r, kappa, omega_p, smooth_r) * notb
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

    variants = [
        ('baseline k2.0', dict(kappa=2.0, omega_p=0.0, smooth_r=False)),
        ('SA-P w0.66 k1.0', dict(kappa=1.0, omega_p=0.66,
                                 smooth_r=False)),
        ('SA-P w0.66 k1.3', dict(kappa=1.3, omega_p=0.66,
                                 smooth_r=False)),
        ('SA-PR w0.66 k1.0', dict(kappa=1.0, omega_p=0.66,
                                  smooth_r=True)),
        ('SA-PR w1.0 k1.0', dict(kappa=1.0, omega_p=1.0, smooth_r=True)),
    ]
    for name, kw in variants:
        norms = np.asarray(trace(cj, bj, vj, tiles, num, 24,
                                 hard_rhs=True, **kw))
        tail = (norms[-1] / norms[-9]) ** 0.125
        print(f'HARD  {name:20s} res24 {norms[-1]:.3e}  tail {tail:.3f}'
              f'  traj {np.array2string(norms[::4], precision=2)}',
              flush=True)
    for name, kw in variants:
        norms = np.asarray(trace(cj, bj, vj, tiles, num, 24,
                                 hard_rhs=False, **kw))
        tail = (norms[-1] / norms[-9]) ** 0.125
        print(f'COLD  {name:20s} res24 {norms[-1]:.3e}  tail {tail:.3f}',
              flush=True)


if __name__ == '__main__':
    main()

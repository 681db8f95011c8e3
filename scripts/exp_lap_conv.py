"""Convergence-vs-cost sweep for the lap solver cycle at scale: V vs
W cycles, GCR history depth, smoothing counts, kappa. Metric: scaled
residual after N GCR iterations on the hard speckle field at 2048^2, and
marginal seconds per iteration -> digits/second.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.simulator import _enable_compile_cache

_enable_compile_cache()

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import (_apply_lap, _deflate, _prolong_pc,
                                    _restrict, _smooth, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    weight_planes)

SHAPE = (2048, 2048)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def cycle_fn(levels, rhs, omega, nu1, nu2, coarse_sweeps, kappa, gamma):
    """Gamma-cycle (1 = V, 2 = W below the finest level)."""
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
        e_c = jnp.zeros(coarse.shape, r.dtype)
        reps = 1 if idx == 0 else gamma
        for _ in range(reps):
            rr = r_c - _apply_lap(coarse.planes, e_c) * coarse.notb \
                if reps > 1 else r_c
            e_c = e_c + cycle(idx + 1, jnp.zeros(coarse.shape, r.dtype),
                              rr)
        u = u + kappa * _prolong_pc(e_c, level.shape) * level.notb
        u = _deflate(level, u, rhs)
        return _smooth(level, u, rhs, omega, nu2)

    return cycle(0, jnp.zeros_like(rhs), rhs)


@functools.partial(jax.jit, static_argnames=(
    'num', 'niter', 'K', 'nu1', 'nu2', 'kappa', 'gamma', 'omega'))
def gcr_run(cond, bmask, bvals, tiles, num: int, niter: int, K: int,
            nu1: int, nu2: int, kappa: float, gamma: int, omega: float):
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    dinv2 = top.dinv * top.dinv
    u0 = jnp.where(bmask, jnp.asarray(bvals, jnp.float32), 500.)
    rhs = -_apply_lap(top.planes, u0) * notb

    def sdot(a, b):
        return jnp.vdot(a * dinv2, b)

    def snorm(r):
        return jnp.linalg.norm(r * top.dinv)

    x0 = jnp.zeros_like(rhs)
    buf = jnp.zeros((K,) + rhs.shape, rhs.dtype)

    def body(carry, _):
        x, Z, Q = carry
        r = (rhs - _apply_lap(top.planes, x)) * notb
        z = cycle_fn(levels, r, omega, nu1, nu2, 32, kappa, gamma) * notb
        q = _apply_lap(top.planes, z) * notb

        def ortho(i, zq):
            z, q = zq
            beta = sdot(q, Q[i])
            return z - beta * Z[i], q - beta * Q[i]

        z, q = jax.lax.fori_loop(0, K, ortho, (z, q))
        nrm2 = sdot(q, q)
        inv = jnp.where(nrm2 > 0, jax.lax.rsqrt(nrm2 + 1e-38), 0.)
        z, q = z * inv, q * inv
        alpha = sdot(r, q)
        x = x + alpha * z
        Z = jnp.concatenate([Z[1:], z[None]])
        Q = jnp.concatenate([Q[1:], q[None]])
        return (x, Z, Q), snorm((rhs - _apply_lap(top.planes, x)) * notb)

    (x, _, _), norms = jax.lax.scan(body, (x0, buf, buf), None,
                                    length=niter)
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
    print(f'islands {k}', flush=True)

    variants = [
        ('baseline V nu2/2 K3 k2.0', dict(K=3, nu1=2, nu2=2, kappa=2.0,
                                          gamma=1, omega=0.85)),
        ('W-cycle  nu2/2 K3 k2.0', dict(K=3, nu1=2, nu2=2, kappa=2.0,
                                        gamma=2, omega=0.85)),
        ('V K8', dict(K=8, nu1=2, nu2=2, kappa=2.0, gamma=1, omega=0.85)),
        ('V nu3/3', dict(K=3, nu1=3, nu2=3, kappa=2.0, gamma=1,
                         omega=0.85)),
        ('V k1.6', dict(K=3, nu1=2, nu2=2, kappa=1.6, gamma=1,
                        omega=0.85)),
        ('W K8', dict(K=8, nu1=2, nu2=2, kappa=2.0, gamma=2, omega=0.85)),
    ]
    niter = 20
    for name, kw in variants:
        def run(n):
            return np.asarray(gcr_run(cj, bj, vj, tiles, num, n, **kw))

        norms = run(niter)
        t0 = time.perf_counter(); run(niter)
        per = (time.perf_counter() - t0) / niter  # includes build (~40 ms)
        # effective rate over the last 10 iterations
        rate = (norms[-1] / norms[-11]) ** 0.1
        digits_per_s = -np.log10(max(rate, 1e-10)) / per
        print(f'{name:28s} res20 {norms[-1]:.2e}  tail-rate {rate:.3f}  '
              f'{per*1e3:6.1f} ms/iter  {digits_per_s:6.1f} digits/s',
              flush=True)


if __name__ == '__main__':
    main()

"""GCR-preconditioned rate: BoxMG vs pc-aggregation hierarchy.

The production metric (VERDICT r2 item 2): asymptotic GCR rate on the
hard speckle field class; pc sits at ~0.86/iter at 2048^2. Target for
the operator-dependent hierarchy: <= 0.7/iter.

Runs on CPU by default (sizes up to 1024^2); pass --tpu for axon runs.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument('--tpu', action='store_true')
parser.add_argument('--sizes', type=str, default='256,512')
parser.add_argument('--iters', type=int, default=40)
args = parser.parse_args()

if not args.tpu:
    os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

if not args.tpu:
    jax.config.update('jax_platforms', 'cpu')

import functools

import jax.numpy as jnp
import numpy as np

from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (build_bmg_levels,
                                      build_tile_hierarchy_bmg, vcycle_bmg)
from ssrs_tpu.potential.lap import (_GCR_K, _apply_lap, build_lap_levels,
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


def gcr_rates(top, cycle, rhs, niter):
    """Per-iteration scaled-residual norms under Orthomin(_GCR_K),
    mirroring lap._gcr_solve but with a pluggable preconditioner."""
    notb, dinv2 = top.notb, top.dinv * top.dinv

    def sdot(a, b):
        return jnp.vdot(a * dinv2, b)

    @jax.jit
    def step(x, Z, Q):
        r = (rhs - _apply_lap(top.planes, x)) * notb
        z = cycle(r) * notb
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
        rn = jnp.linalg.norm((rhs - _apply_lap(top.planes, x)) * notb
                             * top.dinv)
        return x, Z, Q, rn

    x = jnp.zeros_like(rhs)
    buf = jnp.zeros((_GCR_K,) + rhs.shape, rhs.dtype)
    Z = Q = buf
    rns = [float(jnp.linalg.norm(rhs * top.dinv))]
    for _ in range(niter):
        x, Z, Q, rn = step(x, Z, Q)
        rns.append(float(rn))
    return rns


def asym(rns, k=10):
    rates = [b / a for a, b in zip(rns, rns[1:]) if a > 0 and b > 0]
    tail = rates[-k:]
    return float(np.prod(tail) ** (1.0 / len(tail))) if tail else float('nan')


def run(shape, dirn=225., seed=1, niter=40):
    cond = hard_conductivity(shape, seed=seed)
    bmask, _ = boundary_masks(dirn, shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    planes = weight_planes(cond)

    lev_pc = build_lap_levels(planes, jnp.asarray(bmask_np),
                              build_tile_hierarchy(labels, bmask_np), num)
    lev_bmg, pws = build_bmg_levels(
        planes, jnp.asarray(bmask_np),
        build_tile_hierarchy_bmg(labels, bmask_np), num)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * lev_pc[0].notb

    rn_pc = gcr_rates(lev_pc[0], lambda r: vcycle(lev_pc, r,
                                                  jnp.zeros_like(r)),
                      rhs, niter)
    rn_bmg = gcr_rates(lev_bmg[0],
                       lambda r: vcycle_bmg(lev_bmg, pws, r,
                                            jnp.zeros_like(r)),
                       rhs, niter)
    print(f'{shape} islands={k}')
    print(f'  pc : asym(last10)={asym(rn_pc):.3f} '
          f'rrel@{niter}={rn_pc[-1] / rn_pc[0]:.2e}')
    print(f'  bmg: asym(last10)={asym(rn_bmg):.3f} '
          f'rrel@{niter}={rn_bmg[-1] / rn_bmg[0]:.2e}')


if __name__ == '__main__':
    for s in args.sizes.split(','):
        n = int(s)
        run((n, n), niter=args.iters)

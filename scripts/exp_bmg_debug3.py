"""Per-level smoother stability + lambda_max(D^-1 A) on the island field,
plus two-grid rates per level pair, for the BoxMG hierarchy."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from scripts.exp_bmg_debug2 import build, hard_conductivity
from ssrs_tpu.potential.lap import _smooth, apply_level


def lam_max(level, iters=60, seed=0):
    """Power iteration on D^-1 A restricted to cells with diag > 0."""
    rng = np.random.default_rng(seed)
    act = (np.asarray(level.dinv) > 0) & (np.asarray(level.notb) > 0)
    x = jnp.asarray(rng.random(level.shape).astype(np.float32) * act)
    lam = 0.0
    for _ in range(iters):
        y = apply_level(level, x) * level.dinv * level.notb
        n = float(jnp.linalg.norm(y))
        if n == 0:
            return 0.0
        lam = n / float(jnp.linalg.norm(x))
        x = y / n
    return lam


def smoother_rates(level, omega=0.85, seed=0):
    rng = np.random.default_rng(seed)
    rhs = jnp.asarray((rng.random(level.shape) - 0.5).astype(np.float32)) \
        * level.notb
    u = jnp.zeros(level.shape, jnp.float32)
    rn_prev, rates = None, []
    for _ in range(10):
        u = _smooth(level, u, rhs, omega, 4)
        rn = float(jnp.linalg.norm(
            (rhs - apply_level(level, u)) * level.notb * level.dinv))
        if rn_prev:
            rates.append(rn / rn_prev)
        rn_prev = rn
    return rates[-3:]


if __name__ == '__main__':
    levels, pws, planes, labels, k, tiles = build()
    print(f'(128,160) islands={k} levels={len(levels)}')
    for li, lev in enumerate(levels):
        lam = lam_max(lev)
        sr = smoother_rates(lev)
        dmin = float(np.asarray(lev.dinv)[np.asarray(lev.dinv) > 0].min()) \
            if (np.asarray(lev.dinv) > 0).any() else 0.
        print(f'  level {li} {lev.shape} lam_max(D^-1A)={lam:.3f} '
              f'(omega*lam={0.85 * lam:.2f}) smoother(4-sweep) rates '
              f'{[round(x, 3) for x in sr]}')

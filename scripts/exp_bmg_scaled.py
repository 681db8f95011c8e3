"""BoxMG on the Jacobi-normalized operator A^ = D^-1/2 A D^-1/2.

The island disease is a DIAGONAL-SCALE disparity: rows inside 1e-8
islands are 1e-8-scale, so any f32 stencil algebra that mixes them with
O(1) rows loses the physics (measured: f64 bmg 0.742/iter, f32 0.93+).
Under symmetric Jacobi scaling every diagonal is exactly 1 and the
island-constant modes have Rayleigh quotient ~ perimeter/(8|I|) — O(1e-2),
comfortably f32. Preconditioner: M^-1 r = D^-1/2 cycle(D^-1/2 r), no
deflation anywhere (the scaled island modes are ordinary low modes).
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

from scripts.exp_bmg_gcr import asym, gcr_rates, hard_conductivity
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.boxmg import (_level_omega, _shift0, _decimate_mask,
                                      galerkin_rap, interp_planes,
                                      prolong_bmg, restrict_bmg)
from ssrs_tpu.potential.lap import (_DELTAS, _apply_lap, island_labels,
                                    weight_planes)


def scaled_planes(planes):
    """(W~ planes, s~, dhalf_inv): A^ = D^-1/2 A D^-1/2 in planes+s form.
    W~_d(x) = W_d(x) * dsi(x) * dsi(x+d); s~ = 1 - sum_d W~_d where the
    diagonal is nonzero."""
    diag = jnp.sum(planes, axis=0)
    ok = diag > 0.
    dsi = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, diag, 1.)), 0.)
    out = []
    for k, (dr, dc) in enumerate(_DELTAS):
        out.append(planes[k] * dsi * _shift0(dsi, dr, dc))
    wt = jnp.stack(out)
    s = jnp.where(ok, 1.0 - jnp.sum(wt, axis=0), 0.)
    return wt, s, dsi


class Lev:
    def __init__(self, planes, s, notb, omega):
        self.planes, self.s, self.notb, self.omega = planes, s, notb, omega
        diag = jnp.sum(planes, axis=0) + s
        ok = diag > 0.
        self.dinv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.), 0.)

    @property
    def shape(self):
        return self.planes.shape[-2:]


def apply_lev(lev, u):
    return _apply_lap(lev.planes, u) + lev.s * u


def smooth(lev, u, rhs, n):
    for _ in range(n):
        r = rhs - apply_lev(lev, u)
        u = u + (lev.omega * lev.notb * lev.dinv) * r
    return u


def build(planes, bmask, nlev):
    wt, s, dsi = scaled_planes(planes)
    mask = jnp.asarray(bmask, bool)
    levels, pws = [], []
    for i in range(nlev):
        notb = (~mask).astype(jnp.float32)
        diag = jnp.sum(wt, axis=0) + s
        ok = diag > 0.
        dinv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.), 0.)
        om = _level_omega(wt, s, notb, dinv)
        levels.append(Lev(wt, s, notb, om))
        if i + 1 < nlev and min(wt.shape[-2:]) > 4:
            pw = interp_planes(wt, mask)
            pws.append(pw)
            wt, s = galerkin_rap(wt, pw, s=s, raw_s=True)
            mask = _decimate_mask(mask)
    return levels, pws, dsi


def vcycle(levels, pws, rhs, u0, nu1=2, nu2=2, coarse_sweeps=32):
    def cyc(idx, u, rhs):
        lev = levels[idx]
        if idx == len(levels) - 1:
            return smooth(lev, u, rhs, coarse_sweeps)
        u = smooth(lev, u, rhs, nu1)
        r = (rhs - apply_lev(lev, u)) * lev.notb
        coarse = levels[idx + 1]
        r_c = restrict_bmg(r, pws[idx]) * coarse.notb
        e_c = cyc(idx + 1, jnp.zeros(coarse.shape, r.dtype), r_c)
        u = u + prolong_bmg(e_c, pws[idx], lev.shape) * lev.notb
        return smooth(lev, u, rhs, nu2)
    return cyc(0, u0, rhs)


def run(shape, seed=1, niter=40):
    cond = hard_conductivity(shape, seed=seed)
    bmask, _ = boundary_masks(225., shape)
    bmask_np = np.asarray(bmask)
    labels, k = island_labels(cond, bmask_np)
    planes = weight_planes(cond)
    import math
    nlev = max(2, int(math.log2(min(shape))) - 1)
    levels, pws, dsi = build(planes, bmask_np, nlev)
    print(f'{shape} islands={k} levels={len(levels)} '
          f'omegas={[round(float(l.omega), 3) for l in levels]}')

    # GCR on the ORIGINAL A with scaled-cycle preconditioner
    from ssrs_tpu.potential.lap import build_lap_levels, build_tile_hierarchy
    num = 256
    while num < k + 1:
        num *= 4
    lev_pc = build_lap_levels(planes, jnp.asarray(bmask_np),
                              build_tile_hierarchy(labels, bmask_np), num)
    top = lev_pc[0]

    def precond(r):
        rh = dsi * r
        eh = vcycle(levels, pws, rh, jnp.zeros_like(rh))
        return dsi * eh

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32)) \
        * top.notb
    rns = gcr_rates(top, precond, rhs, niter)
    print(f'  scaled-bmg f32 GCR: asym(last10)={asym(rns):.3f} '
          f'rrel@{niter}={rns[-1] / rns[0]:.2e}')


if __name__ == '__main__':
    for n in (256, 512):
        run((n, n))

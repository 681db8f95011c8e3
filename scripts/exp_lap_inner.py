"""Trace the inner-GCR residual trajectory on a refinement-stage
DS residual at 2048^2: does the V-cycle-preconditioned GCR converge on
the f32-floor-noise rhs, or stall?"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from ssrs_tpu.simulator import _enable_compile_cache
_enable_compile_cache()
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.ds import DS, ds_add, ds_from
from ssrs_tpu.potential.lap import (_apply_lap, _gcr_solve, _GCR_K, vcycle,
    apply_lap_ds, build_lap_levels, build_tile_hierarchy, island_labels,
    weight_planes)

SHAPE = (2048, 2048)

def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3*np.pi, nrow)[:, None]
    x = np.linspace(0, 4*np.pi, ncol)[None, :]
    w = 1.5*np.abs(np.sin(x)*np.cos(0.8*y)) + 0.1*rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)

@functools.partial(jax.jit, static_argnames=('num', 'niter'))
def trace(cond, bmask, bvals, tiles, num: int, niter: int):
    bmask = jnp.asarray(bmask, bool)
    bvals = jnp.asarray(bvals, jnp.float32)
    planes = weight_planes(cond)
    levels = build_lap_levels(planes, bmask, tiles, num)
    top = levels[0]
    notb = top.notb
    dinv2 = top.dinv * top.dinv
    u0 = jnp.where(bmask, bvals, 500.)
    def snorm(r): return jnp.linalg.norm(r * top.dinv)
    def sdot(a, b): return jnp.vdot(a * dinv2, b)
    scale = snorm(-_apply_lap(top.planes, u0) * notb) + 1e-30
    r0 = -_apply_lap(top.planes, u0) * notb
    du, rn1 = _gcr_solve(levels, r0, 60, 1e-7 * scale)
    u = u0 + du * notb
    uds = DS(u, jnp.zeros_like(u))
    r = apply_lap_ds(top.planes, uds)
    rhs = -(r.hi + r.lo) * notb
    # unrolled-scan GCR on the DS residual, capture norms
    x0 = jnp.zeros_like(rhs)
    buf = jnp.zeros((_GCR_K,) + rhs.shape, rhs.dtype)
    def body(carry, _):
        x, Z, Q = carry
        r = (rhs - _apply_lap(top.planes, x)) * notb
        z = vcycle(levels, r, jnp.zeros_like(x)) * notb
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
    (x, _, _), norms = jax.lax.scan(body, (x0, buf, buf), None, length=niter)
    return rn1 / scale, snorm(rhs) / scale, norms / snorm(rhs)

def main():
    print(f'device: {jax.devices()[0]}', flush=True)
    cond = hard_conductivity(SHAPE)
    bmask, bvals = boundary_masks(0., SHAPE)
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1: num *= 2
    tiles = build_tile_hierarchy(labels, bmask)
    rn1, rds, norms = trace(jnp.asarray(cond), jnp.asarray(bmask),
                            jnp.asarray(bvals, jnp.float32), tiles, num, 24)
    print(f'stage1 rrel {float(rn1):.3e}; DS residual rrel {float(rds):.3e}')
    for i, n in enumerate(np.asarray(norms)):
        print(f'inner iter {i:2d}: rel-to-rhs {n:.3e}', flush=True)

main()

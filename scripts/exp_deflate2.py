"""Where does the 49.5 ms V-cycle at 16.8M cells go, post round-2 fixes?

Hypothesis: the (T, C, L) f32 one-hot materialized in HBM makes each
deflation einsum bandwidth-bound at ~L x the field traffic, and two
deflations per level dominate the cycle. If so, a Pallas kernel that
builds the one-hot in VMEM (the fused-step histogram trick) is a ~2x
cycle lever.

Measures, warm, axon-safe (np.asarray sync, marginal two-count timing):
  - full vcycle
  - vcycle with _deflate stubbed to identity
  - one _tile_segsum / _tile_broadcast / _apply_lap / _smooth sweep
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

import ssrs_tpu.potential.lap as L
from ssrs_tpu.potential.boundary import boundary_masks


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def timed(fn, *args, reps=8):
    """Marginal cost via two iteration counts (transfers cancel).
    Both reps variants are compiled before the clock starts (reps is a
    static arg — each count is its own executable)."""
    np.asarray(fn(*args, reps).ravel()[0])
    np.asarray(fn(*args, 2 * reps).ravel()[0])
    t0 = time.perf_counter()
    np.asarray(fn(*args, reps).ravel()[0])
    t1 = time.perf_counter()
    np.asarray(fn(*args, 2 * reps).ravel()[0])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps


def main(n=4096):
    shape = (n, n)
    print(f'device {jax.devices()[0]} shape {shape}', flush=True)
    cond = hard_conductivity(shape)
    bmask, bvals = boundary_masks(0., shape)
    labels, k = L.island_labels(cond, np.asarray(bmask))
    num = 256
    while num < k + 1:
        num *= 4
    tiles = L.build_tile_hierarchy(labels, np.asarray(bmask))
    print(f'islands {k}  levels {len(tiles)}  '
          f'L per level {[t.slots.shape[1] for t in tiles]}', flush=True)

    @functools.partial(jax.jit, static_argnames=('reps', 'defl'))
    def cycles(cond, bmask, rhs, reps: int, defl: bool = True):
        planes = L.weight_planes(cond)
        levels = L.build_lap_levels(planes, jnp.asarray(bmask, bool),
                                    tiles, num)
        if not defl:
            levels = [lv._replace(zaz_inv=jnp.zeros_like(lv.zaz_inv))
                      for lv in levels]

        def body(u, _):
            return L.vcycle(levels, rhs, u), None

        u, _ = jax.lax.scan(body, jnp.zeros_like(rhs), None, length=reps)
        return u

    rng = np.random.default_rng(0)
    rhs = jnp.asarray((rng.random(shape) - 0.5).astype(np.float32))
    cj, bj = jnp.asarray(cond), jnp.asarray(bmask)

    dt_full = timed(lambda r, reps: cycles(cj, bj, r, reps, True), rhs)
    dt_nodefl = timed(lambda r, reps: cycles(cj, bj, r, reps, False), rhs)
    print(f'vcycle full    {dt_full * 1e3:7.2f} ms')
    print(f'vcycle nodefl* {dt_nodefl * 1e3:7.2f} ms  '
          '(*zaz_inv=0: same einsums, correction still computed — '
          'measures only arithmetic, NOT the deflation-free cycle)')

    # single-op probes on the fine level; the level (incl. the GB-scale
    # one-hot) is passed as an ARGUMENT — captured as a closure constant
    # it gets embedded in the graph and the compile takes 10+ minutes
    # (the CLAUDE.md large-constant trap)
    planes = L.weight_planes(cj)
    levels = L.build_lap_levels(planes, jnp.asarray(bj, bool), tiles, num)
    top = levels[0]

    @functools.partial(jax.jit, static_argnames=('reps',))
    def seg(top, r, reps: int):
        def body(c, _):
            s = L._tile_segsum(r + c[0, 0] * 0, top.lidx,
                               top.slot_iota, top.sidx,
                               top.sisland, num, top.ocell, top.oisland)
            return c + s[0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros_like(r), None, length=reps)
        return c

    @functools.partial(jax.jit, static_argnames=('reps',))
    def bcast(top, c0, reps: int):
        def body(u, _):
            upd = L._tile_broadcast(c0 + u[0, 0] * 0, top.lidx,
                                    top.slot_iota,
                                    top.sidx, top.sisland, shape,
                                    top.ocell, top.oisland)
            return u + upd, None
        u, _ = jax.lax.scan(body, jnp.zeros(shape, jnp.float32), None,
                            length=reps)
        return u

    @functools.partial(jax.jit, static_argnames=('reps',))
    def apply_op(top, r, reps: int):
        def body(u, _):
            return L._apply_lap(top.planes, u) + r * 1e-9, None
        u, _ = jax.lax.scan(body, r, None, length=reps)
        return u

    @functools.partial(jax.jit, static_argnames=('reps',))
    def smooth(top, r, reps: int):
        def body(u, _):
            return L._smooth(top, u, r, 0.85, 1), None
        u, _ = jax.lax.scan(body, jnp.zeros_like(r), None, length=reps)
        return u

    c0 = jnp.zeros((num,), jnp.float32)
    print(f'segsum (fine)  {timed(seg, top, rhs) * 1e3:7.2f} ms')
    print(f'bcast  (fine)  {timed(bcast, top, c0) * 1e3:7.2f} ms')
    print(f'apply  (fine)  {timed(apply_op, top, rhs) * 1e3:7.2f} ms')
    print(f'smooth sweep   {timed(smooth, top, rhs) * 1e3:7.2f} ms')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

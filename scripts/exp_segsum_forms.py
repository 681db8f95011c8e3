"""Deflation segsum/broadcast formulations head-to-head on TPU.

A: round-2 einsum over a materialized (T, C, 8) f32 one-hot
B: round-3 fused masked reduce (lidx compare fused into the reduction)
C: masked reduce via explicit per-slot loop (8 fused where+sum passes)

Measured because the full solve moved OPPOSITE directions at 4096²
(28.6 -> 4.6 s) and 6667² (62 -> 137 s) after switching A -> B: XLA's
fusion decisions for B appear shape-dependent.
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

_HI = jax.lax.Precision.HIGHEST


def timed(fn, *args, reps=8):
    np.asarray(fn(*args, reps).ravel()[0])
    np.asarray(fn(*args, 2 * reps).ravel()[0])
    t0 = time.perf_counter()
    np.asarray(fn(*args, reps).ravel()[0])
    t1 = time.perf_counter()
    np.asarray(fn(*args, 2 * reps).ravel()[0])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps


def main(n=6667):
    shape = (n, n)
    print(f'device {jax.devices()[0]} shape {shape}', flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape).astype(np.float32))
    mp, npad = L._tiled_dims(shape)
    T = (mp // 32) * (npad // 32)
    lidx = jnp.asarray(rng.integers(0, 8, size=(T, 1024)).astype(np.int16))

    @functools.partial(jax.jit, static_argnames=('reps',))
    def form_a(x, li, reps: int):
        onehot = (li[..., None] ==
                  jnp.arange(8, dtype=li.dtype)).astype(jnp.float32)

        def body(c, _):
            xt = L._to_tiles(x + c[0, 0] * 0)
            part = jnp.einsum('tc,tcl->tl', xt, onehot, precision=_HI)
            return c + part[0, 0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros_like(x), None, length=reps)
        return c

    @functools.partial(jax.jit, static_argnames=('reps',))
    def form_b(x, li, reps: int):
        def body(c, _):
            xt = L._to_tiles(x + c[0, 0] * 0)
            sel = (li[:, None, :] ==
                   jnp.arange(8, dtype=li.dtype)[None, :, None])
            part = jnp.sum(jnp.where(sel, xt[:, None, :], 0.), axis=2)
            return c + part[0, 0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros_like(x), None, length=reps)
        return c

    @functools.partial(jax.jit, static_argnames=('reps',))
    def form_c(x, li, reps: int):
        def body(c, _):
            xt = L._to_tiles(x + c[0, 0] * 0)
            parts = [jnp.sum(jnp.where(li == l, xt, 0.), axis=1)
                     for l in range(8)]
            part = jnp.stack(parts, axis=1)
            return c + part[0, 0] * 0, None
        c, _ = jax.lax.scan(body, jnp.zeros_like(x), None, length=reps)
        return c

    print(f'A einsum+onehot   {timed(form_a, x, lidx) * 1e3:7.2f} ms',
          flush=True)
    print(f'B fused 3d reduce {timed(form_b, x, lidx) * 1e3:7.2f} ms',
          flush=True)
    print(f'C per-slot loop   {timed(form_c, x, lidx) * 1e3:7.2f} ms',
          flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6667)

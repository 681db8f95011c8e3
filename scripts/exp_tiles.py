"""Tile-layout transpose cost: (32, 32) spatial tiles vs (8, 128)
hardware-aligned tiles, and the fused masked-reduce on each.

The deflation's real in-cycle cost turned out to be the _to_tiles /
_from_tiles re-layout (lane-crossing transpose for 32x32 tiles), not
the one-hot reads (exp_deflate2 history: cycle stuck at ~50 ms through
three one-hot variants). An (8, 128) tile IS the v5e native tile, so
its re-layout is a whole-tile shuffle.
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


def timed(fn, *args, reps=16):
    np.asarray(fn(*args, reps).ravel()[0])
    np.asarray(fn(*args, 2 * reps).ravel()[0])
    t0 = time.perf_counter()
    np.asarray(fn(*args, reps).ravel()[0])
    t1 = time.perf_counter()
    np.asarray(fn(*args, 2 * reps).ravel()[0])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps


def make_tilers(th, tw):
    def to_tiles(x):
        m, n = x.shape
        tr, tc = m // th, n // tw
        return (x.reshape(tr, th, tc, tw).transpose(0, 2, 1, 3)
                .reshape(tr * tc, th * tw))

    def from_tiles(xt, shape):
        m, n = shape
        tr, tc = m // th, n // tw
        return (xt.reshape(tr, tc, th, tw).transpose(0, 2, 1, 3)
                .reshape(m, n))

    return to_tiles, from_tiles


def main(n=4096):
    shape = (n, n)
    print(f'device {jax.devices()[0]} shape {shape}', flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape).astype(np.float32))
    lidx_np = rng.integers(0, 12, size=(n * n // 1024, 1024)).astype(
        np.int16)
    lidx = jnp.asarray(lidx_np)

    for th, tw in ((32, 32), (8, 128), (16, 128), (8, 512)):
        to_tiles, from_tiles = make_tilers(th, tw)
        C = th * tw
        lidx_t = jnp.asarray(
            rng.integers(0, 12, size=(n * n // C, C)).astype(np.int16))

        @functools.partial(jax.jit, static_argnames=('reps',))
        def round_trip(x, reps: int, _tt=to_tiles, _ft=from_tiles):
            def body(u, _):
                return _ft(_tt(u) + 1.0, shape), None
            u, _ = jax.lax.scan(body, x, None, length=reps)
            return u

        @functools.partial(jax.jit, static_argnames=('reps',))
        def masked_seg(x, li, reps: int, _tt=to_tiles):
            def body(c, _):
                xt = _tt(x + c[0, 0] * 0)
                sel = (li[:, None, :] ==
                       jnp.arange(8, dtype=li.dtype)[None, :, None])
                part = jnp.sum(jnp.where(sel, xt[:, None, :], 0.), axis=2)
                return c + part[0, 0] * 0, None
            c, _ = jax.lax.scan(body, jnp.zeros_like(x), None,
                                length=reps)
            return c

        rt = timed(round_trip, x)
        sg = timed(masked_seg, x, lidx_t)
        print(f'tile ({th:3d},{tw:4d}): to+from {rt * 1e3:6.2f} ms  '
              f'masked-seg {sg * 1e3:6.2f} ms', flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

"""Restrict/prolong implementation shootout at 4096^2 on TPU:
strided-slice (round-1), stride-2 conv, reduce_window, and 0/1
selector-matrix matmuls (pure MXU). Bandwidth bound ~0.3 ms round trip.
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

SHAPE = (4096, 4096)


def timed(name, fn, *args, n=16):
    @functools.partial(jax.jit, static_argnames=('length',))
    def chain(x, rest, length: int):
        def body(x, _):
            return fn(x, *rest), ()
        x, _ = jax.lax.scan(body, x, None, length=length)
        return jnp.sum(x)

    x0, rest = args[0], args[1:]

    def run(length):
        np.asarray(chain(x0, rest, length))

    run(n); run(2 * n)
    t0 = time.perf_counter(); run(n);     t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); run(2 * n); t_b = time.perf_counter() - t0
    print(f'{name:44s} {(t_b - t_a)/n*1e3:9.3f} ms/iter', flush=True)


def _sel(mc, m, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, (mc, m), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (mc, m), 1)
    return (j // 2 == i).astype(dtype)


def restrict_mm(r):
    m, n = r.shape
    Rr = _sel(m // 2, m, r.dtype)
    Rc = _sel(n // 2, n, r.dtype)
    P = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Rr, r, precision=P), Rc.T, precision=P)


def prolong_mm(e, fine_shape):
    m, n = e.shape
    Rr = _sel(m, 2 * m, e.dtype)
    Rc = _sel(n, 2 * n, e.dtype)
    P = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Rr.T, e, precision=P), Rc,
                      precision=P)[:fine_shape[0], :fine_shape[1]]


def restrict_strided(r):
    return r[::2, ::2] + r[1::2, ::2] + r[::2, 1::2] + r[1::2, 1::2]


def restrict_rw(r):
    return jax.lax.reduce_window(r, 0., jax.lax.add, (2, 2), (2, 2),
                                 'VALID')


def prolong_bc(e, fine_shape):
    m, n = e.shape
    out = jnp.broadcast_to(e[:, None, :, None], (m, 2, n, 2))
    return out.reshape(2 * m, 2 * n)[:fine_shape[0], :fine_shape[1]]


def main():
    print(f'device: {jax.devices()[0]}  shape={SHAPE}', flush=True)
    u = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32))

    # correctness cross-check on small input first
    xs = jnp.asarray(np.random.default_rng(1).random((64, 64), np.float32))
    a = np.asarray(jax.jit(restrict_mm)(xs))
    b = np.asarray(jax.jit(restrict_strided)(xs))
    c = np.asarray(jax.jit(restrict_rw)(xs))
    assert np.allclose(a, b, atol=1e-5) and np.allclose(c, b, atol=1e-5)
    es = jnp.asarray(np.random.default_rng(2).random((32, 32), np.float32))
    pa = np.asarray(jax.jit(lambda e: prolong_mm(e, (64, 64)))(es))
    pb = np.asarray(jax.jit(lambda e: prolong_bc(e, (64, 64)))(es))
    assert np.allclose(pa, pb)
    print('correctness ok', flush=True)

    for name, fn in [
            ('restrict strided-slice', lambda x: x * 1.0000001 + 0 *
             jnp.sum(restrict_strided(x))),
            ]:
        pass

    timed('restrict matmul', lambda x: x + 1e-12 *
          jnp.sum(restrict_mm(x)), u)
    timed('restrict reduce_window', lambda x: x + 1e-12 *
          jnp.sum(restrict_rw(x)), u)
    timed('restrict strided', lambda x: x + 1e-12 *
          jnp.sum(restrict_strided(x)), u)
    timed('rp round trip matmul', lambda x: x + 1e-12 *
          prolong_mm(restrict_mm(x), SHAPE), u)
    timed('rp round trip rw+broadcast', lambda x: x + 1e-12 *
          prolong_bc(restrict_rw(x), SHAPE), u)
    timed('rp round trip rw+matmulprolong', lambda x: x + 1e-12 *
          prolong_mm(restrict_rw(x), SHAPE), u)


if __name__ == '__main__':
    main()

"""Microprobe: per-op cost of the lap V-cycle building blocks at 4096^2
(16.8M cells) on TPU — apply, deflation segment_sum, label gather,
restrict/prolong, Galerkin coarsening. Identifies what the s/cycle buys.

Timing discipline (CLAUDE.md): block_until_ready does NOT sync on axon.
Each op is timed by scanning it N times chained (output feeds input),
materializing a scalar that depends on all iterations via np.asarray,
and taking the marginal cost between two scan lengths so transfer and
dispatch overheads cancel. Operands are explicit jit arguments (closures
over device arrays embed them in the remote-compile payload, which the
axon tunnel rejects at 4096^2 sizes).
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
from ssrs_tpu.potential.lap import (_apply_lap, _galerkin_coarsen,
                                    _prolong_pc, _restrict, island_labels,
                                    weight_planes)

SHAPE = (4096, 4096)


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=('step_name', 'length', 'num'))
def chain(x, planes, lab, step_name: str, length: int, num: int):
    def step(x):
        if step_name == 'apply':
            return _apply_lap(planes, x)
        if step_name == 'segsum':
            s = jax.ops.segment_sum(x.ravel(), lab.ravel(),
                                    num_segments=num)
            return x + 1e-12 * s[lab]
        if step_name == 'gather':
            c = jnp.arange(num, dtype=jnp.float32) * (1 + 1e-12 * x[0, 0])
            return x + 1e-12 * c[lab]
        if step_name == 'rp':
            return x + 1e-12 * _prolong_pc(_restrict(x), x.shape)
        if step_name == 'coarsen':
            p = planes * (1 + 1e-12 * x[0, 0])
            return x + 1e-12 * jnp.sum(_galerkin_coarsen(p))
        if step_name == 'build':
            return x + 1e-12 * jnp.sum(weight_planes(x))
        raise ValueError(step_name)

    def body(x, _):
        return step(x), ()
    x, _ = jax.lax.scan(body, x, None, length=length)
    return jnp.sum(x)


def timed_chain(name, step_name, x0, planes, lab, num, n=32):
    def run(length):
        np.asarray(chain(x0, planes, lab, step_name, length, num))

    run(n)
    run(2 * n)
    t0 = time.perf_counter(); run(n);     t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); run(2 * n); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / n
    print(f'{name:42s} {per*1e3:9.3f} ms/iter  (chain {n} vs {2*n})',
          flush=True)
    return per


def main():
    print(f'device: {jax.devices()[0]}  shape={SHAPE}', flush=True)
    cond = hard_conductivity(SHAPE)
    bmask, _ = boundary_masks(0., SHAPE)
    labels, k = island_labels(cond, bmask)
    num = 64
    while num < k + 1:
        num *= 2
    print(f'islands: {k} (num_segments {num})', flush=True)

    planes = jax.jit(weight_planes)(jnp.asarray(cond))
    u = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32))
    lab = jnp.asarray(labels)
    np.asarray(planes[0, 0, 0])

    for name, key in [
            ('apply_lap (8-plane stencil)', 'apply'),
            ('segment_sum 16.8M -> num (+gather back)', 'segsum'),
            ('c[labels] gather only', 'gather'),
            ('restrict+prolong round trip', 'rp'),
            ('galerkin_coarsen (one level)', 'coarsen'),
            ('weight_planes (build, fine)', 'build')]:
        timed_chain(name, key, u, planes, lab, num)


if __name__ == '__main__':
    main()

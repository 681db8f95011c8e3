"""Microprobe: per-op cost of the lap V-cycle building blocks at 4096^2
(16.8M cells) on TPU — apply, deflation segment_sum, label gather,
restrict/prolong, Galerkin coarsening. Identifies what the 1.05 s/cycle
actually buys."""

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


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    print(f'{name:38s} {sorted(times)[len(times)//2]*1e3:9.2f} ms',
          flush=True)


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
    planes.block_until_ready()
    u = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32))
    lab = jnp.asarray(labels)

    timeit('apply_lap (8-plane stencil)',
           jax.jit(_apply_lap), planes, u)
    seg = jax.jit(lambda r, l: jax.ops.segment_sum(
        r.ravel(), l.ravel(), num_segments=num))
    timeit('segment_sum 16.8M -> num', seg, u, lab)
    gat = jax.jit(lambda c, l: c[l])
    timeit('c[labels] broadcast gather', gat,
           jnp.ones((num,), jnp.float32), lab)
    timeit('restrict (block sum)', jax.jit(_restrict), u)
    ec = jnp.asarray(np.random.default_rng(1).random(
        (SHAPE[0] // 2, SHAPE[1] // 2), np.float32))
    timeit('prolong (pc)', jax.jit(
        lambda e: _prolong_pc(e, SHAPE)), ec)
    timeit('galerkin_coarsen (one level)',
           jax.jit(_galerkin_coarsen), planes)
    timeit('weight_planes (build, fine)',
           jax.jit(weight_planes), jnp.asarray(cond))


if __name__ == '__main__':
    main()

"""Candidate primitives for gather/scatter-free island deflation at
4096^2 (16.8M cells, ~23k islands) on TPU.

Measured problem (exp_lap_micro): jax.ops.segment_sum lowers to a serial
scatter (~290 ms) and c[labels] to a serial gather (~145 ms) — both
~7 ns/element. Candidates here:

- tiled-dictionary one-hot einsum: per spatial tile, a local dictionary
  of the few labels present; per-island sums = batched matvec against a
  materialized (T, C, L) one-hot + a small (T*L) second-stage scatter;
  broadcast-back = small gather + transpose matvec.
- conv-based restrict/prolong/galerkin (new lap.py implementations).

Timing: chained scan + np.asarray sync (block_until_ready lies on axon).
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
from ssrs_tpu.potential.lap import (_galerkin_coarsen, _prolong_pc,
                                    _restrict, island_labels, weight_planes)

SHAPE = (4096, 4096)
TILE = 32  # tile side; C = TILE*TILE cells per tile


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def build_tiles(labels: np.ndarray, tile: int):
    """Host: (lidx (T, C) int32 local label index, dict (T, L) int32
    global label, L). Background label 0 always occupies slot 0."""
    nrow, ncol = labels.shape
    assert nrow % tile == 0 and ncol % tile == 0
    tr, tc = nrow // tile, ncol // tile
    lt = labels.reshape(tr, tile, tc, tile).transpose(0, 2, 1, 3)
    lt = lt.reshape(tr * tc, tile * tile)  # (T, C)
    T, C = lt.shape
    lidx = np.zeros((T, C), np.int32)
    counts = []
    dicts = []
    for t in range(T):
        uniq, inv = np.unique(lt[t], return_inverse=True)
        # force background label 0 into slot 0 for determinism
        if uniq[0] != 0:
            uniq = np.concatenate([[0], uniq])
            inv = inv + 1
        lidx[t] = inv
        dicts.append(uniq)
        counts.append(len(uniq))
    L = 1
    while L < max(counts):
        L *= 2
    dict_arr = np.zeros((T, L), np.int32)
    for t, u in enumerate(dicts):
        dict_arr[t, :len(u)] = u
    return lidx, dict_arr, L, max(counts)


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


def main():
    print(f'device: {jax.devices()[0]}  shape={SHAPE} tile={TILE}',
          flush=True)
    cond = hard_conductivity(SHAPE)
    bmask, _ = boundary_masks(0., SHAPE)
    t0 = time.perf_counter()
    labels, k = island_labels(cond, bmask)
    t_lab = time.perf_counter() - t0
    num = 64
    while num < k + 1:
        num *= 2
    t0 = time.perf_counter()
    lidx, dict_arr, L, lmax = build_tiles(labels, TILE)
    t_tile = time.perf_counter() - t0
    T, C = lidx.shape
    print(f'islands {k} (num {num}); tiles T={T} C={C} L={L} '
          f'(max unique {lmax}); label {t_lab:.2f}s tile-build '
          f'{t_tile:.2f}s; onehot {T*C*L*4/1e9:.2f} GB f32', flush=True)

    u = jnp.asarray(np.random.default_rng(0).random(SHAPE, np.float32))
    lab = jnp.asarray(labels)
    lidx_j = jnp.asarray(lidx)
    dict_j = jnp.asarray(dict_arr)
    planes = jax.jit(weight_planes)(jnp.asarray(cond))
    np.asarray(planes[0, 0, 0])

    # materialize one-hot once (simulating per-solve build)
    @jax.jit
    def build_onehot(lidx_j):
        return (lidx_j[..., None] ==
                jnp.arange(L, dtype=jnp.int32)).astype(jnp.float32)

    t0 = time.perf_counter()
    O = build_onehot(lidx_j)
    np.asarray(O[0, 0, 0])
    print(f'onehot build+materialize: {time.perf_counter()-t0:.3f} s',
          flush=True)

    tr = SHAPE[0] // TILE
    tcn = SHAPE[1] // TILE

    def to_tiles(x):
        return x.reshape(tr, TILE, tcn, TILE).transpose(0, 2, 1, 3
                                                        ).reshape(T, C)

    def from_tiles(xt):
        return xt.reshape(tr, tcn, TILE, TILE).transpose(0, 2, 1, 3
                                                         ).reshape(SHAPE)

    # candidate: full deflate round trip (segsum + broadcast back)
    def deflate_tiled(x, O, dict_j):
        xt = to_tiles(x)
        part = jnp.einsum('tc,tcl->tl', xt, O)           # per-tile sums
        rsum = jax.ops.segment_sum(part.ravel(), dict_j.ravel(),
                                   num_segments=num)     # small scatter
        c = rsum.at[0].set(0.)
        c_local = c[dict_j]                              # small gather
        back = jnp.einsum('tl,tcl->tc', c_local, O)
        return x + 1e-12 * from_tiles(back)

    timed('tiled deflate round trip (einsum x2)', deflate_tiled,
          u, O, dict_j)

    def seg_only(x, O, dict_j):
        xt = to_tiles(x)
        part = jnp.einsum('tc,tcl->tl', xt, O)
        rsum = jax.ops.segment_sum(part.ravel(), dict_j.ravel(),
                                   num_segments=num)
        return x * (1 + 1e-12 * rsum[0])

    timed('tiled segsum only (einsum + small scatter)', seg_only,
          u, O, dict_j)

    def tile_reshape_only(x):
        return from_tiles(to_tiles(x) * 1.0000001)

    timed('tile reshape round trip only', tile_reshape_only, u)

    def rp_conv(x):
        return x + 1e-12 * _prolong_pc(_restrict(x), SHAPE)

    timed('restrict+prolong round trip (conv)', rp_conv, u)

    def coarsen_conv(x, planes):
        p = planes * (1 + 1e-12 * x[0, 0])
        return x + 1e-12 * jnp.sum(_galerkin_coarsen(p))

    timed('galerkin_coarsen (conv)', coarsen_conv, u, planes)

    # reference: small scatter/gather cost model at T*L
    small = jnp.asarray(
        np.random.default_rng(1).random(T * L, np.float32))
    ids = jnp.asarray(dict_arr.ravel())

    def small_scatter(x, small, ids):
        s = jax.ops.segment_sum(small * (1 + 1e-12 * x[0, 0]), ids,
                                num_segments=num)
        return x * (1 + 1e-12 * s[0])

    timed(f'small segment_sum ({T*L} elems)', small_scatter, u, small, ids)


if __name__ == '__main__':
    main()

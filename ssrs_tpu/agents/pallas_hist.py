"""Pallas TPU histogram kernel for presence accumulation.

The presence update dominates the agent step: XLA's scatter-add serializes
(measured 92% of step time), and the XLA-level one-hot matmul histogram,
while 25% faster, materializes ~220 MB/step of one-hot operands in HBM.
This kernel performs the same one-hot-matmul histogram with everything
VMEM-resident: per grid step it loads a tile of agent positions (bytes),
builds the row/col one-hot tiles in VMEM, runs the int-exact MXU matmul,
and accumulates into a VMEM scratch; only the final (nrow, ncol) counts
travel to HBM.

Correctness: counts are accumulated in float32; each call contributes at
most N <= 2^24 to any cell, so the f32 accumulation is exact and the final
int32 cast is lossless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hist_kernel(r_ref, c_ref, w_ref, out_ref, acc_ref, *, nrow_p, ncol_p):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = r_ref[:]            # (tile,) int32 row indices
    c = c_ref[:]            # (tile,) int32 col indices
    w = w_ref[:]            # (tile,) float32 weights (0 for dead agents)
    tile = r.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, nrow_p), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, ncol_p), 1)
    # bf16 one-hots are exact for 0/1 (and small-integer weights); the
    # MXU accumulates in f32 via preferred_element_type
    oh_r = jnp.where(row_iota == r[:, None], w[:, None], 0.).astype(
        jnp.bfloat16)
    oh_c = (col_iota == c[:, None]).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        oh_r, oh_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.int32)


def _hist_kernel_nw(r_ref, c_ref, out_ref, acc_ref, *, nrow_p, ncol_p):
    """Weightless variant: dead points carry row index -1, which matches
    no one-hot column and contributes nothing. Inputs may be int16 (the
    chunk-batched driver emits (chunk, N) int16 position planes to halve
    the HBM round-trip); the cast happens in VMEM."""
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r = r_ref[:].astype(jnp.int32)
    c = c_ref[:].astype(jnp.int32)
    tile = r.shape[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, nrow_p), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, ncol_p), 1)
    oh_r = (row_iota == r[:, None]).astype(jnp.bfloat16)
    oh_c = (col_iota == c[:, None]).astype(jnp.bfloat16)
    # each tile's f32 matmul result is <= tile < 2^24 (exact); the
    # running accumulation is int32, so the batched histogram is exact
    # for ANY number of points per call
    acc_ref[:] += jax.lax.dot_general(
        oh_r, oh_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)

    @pl.when(i == n_i - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=('nrow', 'ncol', 'tile'))
def presence_histogram_batch(rows: jax.Array, cols: jax.Array,
                             nrow: int, ncol: int,
                             tile: int = 2048) -> jax.Array:
    """int32 2-D histogram of flat (rows, cols) int16/int32 index arrays.

    Batched-call variant for the chunk-emitting step driver
    (``simulate.py::_run_chunk_hist``): one call covers a whole chunk of
    steps (chunk*N points), so the per-call latency that made the
    per-step in-scan Pallas call a wash is amortized ~chunk-fold. Dead
    points are encoded as row index -1 (no weights input). f32
    accumulation is exact below 2^24 per cell, which a single chunk
    cannot exceed.
    """
    n = rows.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    nrow_p = _round_up(nrow, 128)
    ncol_p = _round_up(ncol, 128)
    if n_pad != n:
        pad = n_pad - n
        rows = jnp.concatenate([rows, jnp.full((pad,), -1, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])

    out = pl.pallas_call(
        functools.partial(_hist_kernel_nw, nrow_p=nrow_p, ncol_p=ncol_p),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrow_p, ncol_p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrow_p, ncol_p), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nrow_p, ncol_p), jnp.int32)],
    )(rows, cols)
    return out[:nrow, :ncol]


@functools.partial(jax.jit, static_argnames=('nrow', 'ncol', 'tile'))
def presence_histogram(rows: jax.Array, cols: jax.Array,
                       weights: jax.Array, nrow: int, ncol: int,
                       tile: int = 2048) -> jax.Array:
    """int32 2-D histogram of (rows, cols) with per-agent weights.

    ``weights`` is float32 (typically the alive mask); out-of-range
    indices contribute nothing (they match no one-hot column).
    """
    n = rows.shape[0]
    n_pad = _round_up(max(n, tile), tile)
    nrow_p = _round_up(nrow, 128)
    ncol_p = _round_up(ncol, 128)
    if n_pad != n:
        pad = n_pad - n
        rows = jnp.concatenate([rows, jnp.full((pad,), -1, rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        weights = jnp.concatenate([weights,
                                   jnp.zeros((pad,), weights.dtype)])

    out = pl.pallas_call(
        functools.partial(_hist_kernel, nrow_p=nrow_p, ncol_p=ncol_p),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrow_p, ncol_p), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrow_p, ncol_p), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nrow_p, ncol_p), jnp.float32)],
    )(rows.astype(jnp.int32), cols.astype(jnp.int32),
      weights.astype(jnp.float32))
    return out[:nrow, :ncol]

"""Fused Pallas agent-step kernel: cascade + sampling + memory + histogram.

The production XLA step (agents/simulate.py:make_step_fn) is, at a 100k
bucket, ~605 us/step: ~204 us 9-float table gather (issue-rate-bound, its
algorithmic floor), ~275 us presence one-hot matmul (dominated by one-hot
materialization through HBM: ~110 MB/step of int8 operands that XLA fails
to fuse into its histogram convolution inside the sequential scan), and
~127 us of cascade/sampling VPU chains (docs/DESIGN.md "Measured step
anatomy").

This kernel fuses everything after the gather into ONE pallas_call per
step, per agent block:

- direction-memory mask via (9,9) @ one-hot MXU dots,
- the reference fallback cascade + nu sharpening (ssrs/movmodel.py:220-244)
  in (9, BLK) layout (agents on lanes),
- inverse-CDF categorical sampling from per-agent uniforms,
- move application + ring-buffer update,
- presence histogram with the one-hot operands built IN VMEM (never
  materialized to HBM) and accumulated across agent blocks in a VMEM
  scratch accumulator.

The table gather stays in XLA: a Pallas kernel cannot express a per-lane
dynamic VMEM gather (Mosaic limitation, docs/DESIGN.md), and the XLA
gather already runs at its ~2 ns/row VMEM issue rate while the table
fits the gather's VMEM budget (~6-8 MB; past it, a flat HBM-latency
~15-20 ns/row — DESIGN.md "the gather is a VMEM-capacity story").

Semantics are identical to the XLA step for the same per-agent uniforms
(verified bit-exact in tests/test_fused_step.py); the sampled move index
per agent is the same inverse-CDF construction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    # deliberately the same function as simulate._round_up (importing
    # it would be circular: simulate lazily imports this module); the
    # padding semantics must match simulate.TrackParams.padded_grid
    return ((x + m - 1) // m) * m


def _fused_kernel(tabT_ref, dirp_ref, base_ref, pr_ref, pc_ref,
                  r_ref, c_ref, alive_ref, palive_ref, mem_ref, u_ref,
                  nr_ref, nc_ref, nmem_ref, hist_ref, acc_ref,
                  *, nu: float, memory_k: int, nrow_p: int, ncol_p: int,
                  oh_dtype, hist_mode: str, hist_src: str):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    blk = r_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = base_ref[:].astype(jnp.float32)            # (9, BLK)
    alive = alive_ref[:] != 0                         # (BLK,) bool
    move_iota = jax.lax.broadcasted_iota(jnp.int32, (9, blk), 0)
    center0 = (move_iota != 4).astype(jnp.float32)    # (9, BLK)
    dirp = dirp_ref[:]                                # (9, 1) f32
    dirp_c0 = dirp * center0

    # direction-memory restriction: AND of one mask row per remembered
    # move, each fetched from the (9, 9) table by a tiny one-hot MXU dot
    # (exact 0/1 arithmetic; XLA's jnp.take here was a real gather)
    mask = None
    for k in range(memory_k):
        ohm = (mem_ref[k, :][None, :] == move_iota).astype(jnp.float32)
        mcol = jax.lax.dot_general(
            tabT_ref[:], ohm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (9, BLK)
        mask = mcol if mask is None else mask * mcol
    if mask is not None:
        mask = mask * center0

    # fallback cascade (ssrs/movmodel.py:233-241); NaN/clip/center
    # prologue pre-folded into the table by prepared_weights
    p = base * mask if mask is not None else base
    if mask is not None:
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_c0 * mask, p)
    allz = jnp.sum(p, axis=0, keepdims=True) == 0.
    p = jnp.where(allz, jnp.broadcast_to(dirp, (9, blk)), p)
    if nu == 0.0:
        # NumPy 0**0 == 1: a uniform walk over all nine cells
        p = jnp.ones_like(p)
    elif nu != 1.0:
        pmax = jnp.max(p, axis=0, keepdims=True)
        p = p / pmax
        # p in [0, 1]; exp/log form (Mosaic-friendly), exact 0 preserved
        p = jnp.where(p > 0.,
                      jnp.exp(nu * jnp.log(jnp.maximum(p, 1e-30))), 0.)

    # inverse-CDF sample: mi = #{j : cum_j < u * total}
    total = jnp.sum(p, axis=0)                        # (BLK,)
    u = jnp.maximum(u_ref[:], jnp.finfo(jnp.float32).tiny)
    thresh = u * total
    cum = jnp.zeros((blk,), jnp.float32)
    cnt = jnp.zeros((blk,), jnp.int32)
    for j in range(9):
        cum = cum + p[j, :]
        cnt = cnt + (cum < thresh).astype(jnp.int32)
    mi = jnp.minimum(cnt, 8)

    dr = mi // 3 - 1
    dc = mi - (mi // 3) * 3 - 1
    new_r = jnp.where(alive, pr_ref[:] + dr, r_ref[:])
    new_c = jnp.where(alive, pc_ref[:] + dc, c_ref[:])
    nr_ref[:] = new_r
    nc_ref[:] = new_c
    if memory_k > 0:
        for k in range(memory_k - 1):
            nmem_ref[k, :] = jnp.where(alive, mem_ref[k + 1, :],
                                       mem_ref[k, :])
        nmem_ref[memory_k - 1, :] = jnp.where(alive, mi,
                                              mem_ref[memory_k - 1, :])
    else:
        nmem_ref[0, :] = mem_ref[0, :]

    # presence histogram: one-hots built in VMEM, MXU product, VMEM
    # accumulate; dead agents contribute nothing via the row one-hot
    if hist_mode == 'none':
        @pl.when(i == n_i - 1)
        def _():
            hist_ref[:] = jnp.zeros_like(hist_ref)
        return
    if hist_src == 'cur':
        # delayed histogram: count the CARRIED position with the
        # previous step's alive mask (exactness: the multiset of counted
        # (pos, alive) pairs is the original shifted by one step; the
        # driver adds the final positions once after the loop). Breaks
        # the sample -> histogram dependency inside the step.
        h_r, h_c, h_alive = r_ref[:], c_ref[:], palive_ref[:] != 0
    else:
        h_r, h_c, h_alive = new_r, new_c, alive
    if hist_mode.startswith('lanes'):
        # both one-hots in natural layout (agents on lanes), contraction
        # over the lane axis; accumulator is transposed (ncol_p, nrow_p).
        # The dead-agent mask folds into the row VALUE (-1 matches no
        # one-hot row) — one (BLK,) select instead of an
        # (nrow_p, BLK) AND pass
        rm = jnp.where(h_alive, h_r, -1)
        ohr = (rm[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (nrow_p, blk), 0)).astype(oh_dtype)
        ohc = (h_c[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (ncol_p, blk), 0)).astype(oh_dtype)
        acc_ref[:] += jax.lax.dot_general(
            ohc, ohr, (((1,), (1,)), ((), ())),
            preferred_element_type=acc_ref.dtype)

        @pl.when(i == n_i - 1)
        def _():
            hist_ref[:] = acc_ref[:].astype(jnp.int32).T
        return
    if hist_mode == 'buildsum':
        # diagnostic: one-hot build cost without the MXU product
        ohr = ((h_r[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (nrow_p, blk), 0)) & h_alive[None, :]).astype(
                oh_dtype)
        ohc = (h_c[None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (ncol_p, blk), 0)).astype(oh_dtype)
        acc_ref[0:1, 0:1] += (
            jnp.sum(ohr.astype(jnp.float32)) +
            jnp.sum(ohc.astype(jnp.float32))).reshape(1, 1).astype(
                acc_ref.dtype)

        @pl.when(i == n_i - 1)
        def _():
            hist_ref[:] = acc_ref[:].astype(jnp.int32).T
        return
    ohr_t = ((h_r[None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (nrow_p, blk), 0)) & h_alive[None, :]).astype(oh_dtype)
    oh_c = (h_c[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (blk, ncol_p), 1)).astype(oh_dtype)
    acc_ref[:] += jax.lax.dot_general(
        ohr_t, oh_c, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype)

    @pl.when(i == n_i - 1)
    def _():
        hist_ref[:] = acc_ref[:].astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=('nu', 'memory_k', 'grid_shape', 'blk', 'oh_bits',
                     'hist_mode', 'hist_src', 'interpret'))
def fused_step_call(tabT: jax.Array, dirp: jax.Array, base: jax.Array,
                    pr: jax.Array, pc: jax.Array,
                    r: jax.Array, c: jax.Array, alive_i32: jax.Array,
                    palive_i32: jax.Array,
                    mem: jax.Array, u: jax.Array,
                    nu: float, memory_k: int,
                    grid_shape: Tuple[int, int],
                    blk: int = 1024, oh_bits: int = 8,
                    hist_mode: str = 'lanes', hist_src: str = 'new',
                    interpret: bool = False):
    """One fused agent-step over the whole population.

    Parameters
    ----------
    tabT : (9, 9) f32 transposed restriction table
    dirp : (9, 1) f32 directional prior column
    base : (9, N) gathered move weights (bf16 or f32; cast in VMEM)
    pr, pc : (N,) i32 positions after the burn-in push
    r, c : (N,) i32 current positions (kept for dead agents)
    alive_i32 : (N,) i32 1/0
    mem : (max(memory_k, 1), N) i32 ring buffer, oldest first (row 0);
        passed through untouched when memory_k == 0
    u : (N,) f32 per-agent uniforms
    oh_bits : 8 -> int8 one-hots + int32 MXU accumulate;
        16 -> bf16 one-hots + f32 accumulate (exact below 2^24/step)

    Returns (new_r, new_c, new_mem, hist) with hist int32
    (nrow_p, ncol_p) padded to tile multiples; slice [:nrow, :ncol].
    N must be a multiple of blk (pad agents dead).
    """
    nrow, ncol = grid_shape
    nrow_p = _round_up(nrow, 8)
    ncol_p = _round_up(ncol, 128)
    n = r.shape[0]
    assert n % blk == 0, (n, blk)
    k_eff = max(memory_k, 1)
    if oh_bits == 8:
        oh_dtype, acc_dtype = jnp.int8, jnp.int32
    else:
        oh_dtype, acc_dtype = jnp.bfloat16, jnp.float32
    if hist_mode == 'none':
        # no in-kernel histogram: a tile-sized placeholder keeps the
        # kernel signature uniform without putting the (padded) grid in
        # VMEM — this is what lets the fused cascade/sampler run on
        # grids whose histogram could never fit (the caller accumulates
        # presence outside, e.g. via an XLA scatter)
        hist_shape = acc_shape = (8, 128)
    else:
        hist_shape = (nrow_p, ncol_p)
        acc_shape = ((ncol_p, nrow_p)
                     if (hist_mode.startswith('lanes')
                         or hist_mode == 'buildsum')
                     else (nrow_p, ncol_p))

    kern = functools.partial(
        _fused_kernel, nu=float(nu), memory_k=memory_k,
        nrow_p=nrow_p, ncol_p=ncol_p, oh_dtype=oh_dtype,
        hist_mode=hist_mode, hist_src=hist_src)

    # inside a shard_map body (real TPU meshes: the sharded drivers now
    # resolve to this kernel) outputs must declare which mesh axes they
    # vary over; take the union of the operand vmas (agent-axis operands
    # carry the mesh axis, the replicated tables carry none). Outside
    # shard_map every vma is empty and this is a no-op.
    vma = frozenset()
    for op in (base, pr, pc, r, c, alive_i32, palive_i32, mem, u):
        vma |= getattr(jax.typeof(op), 'vma', frozenset())

    def vec():
        return pl.BlockSpec((blk,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    new_r, new_c, new_mem, hist = pl.pallas_call(
        kern,
        grid=(n // blk,),
        in_specs=[
            const((9, 9)),                                   # tabT
            const((9, 1)),                                   # dirp
            pl.BlockSpec((9, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),           # base
            vec(), vec(), vec(), vec(), vec(), vec(),  # pr pc r c a pa
            pl.BlockSpec((k_eff, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),           # mem
            vec(),                                           # u
        ],
        out_specs=(
            vec(), vec(),
            pl.BlockSpec((k_eff, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(hist_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((n,), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((k_eff, n), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct(hist_shape, jnp.int32, vma=vma),
        ),
        scratch_shapes=[pltpu.VMEM(acc_shape, acc_dtype)],
        interpret=interpret,
    )(tabT, dirp, base, pr, pc, r, c, alive_i32, palive_i32, mem, u)
    return new_r, new_c, new_mem, hist

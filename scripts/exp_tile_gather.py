"""Windowed (sorted-tile) weight gather at HBM-resident table sizes —
the VERDICT r4 item 8 experiment.

At 2048^2 the (4.2M, 9) table cannot fit VMEM and the per-step gather
pays a flat ~14.8 ns/row (bf16) / ~20 ns/row (f32) HBM random-access
LATENCY — 1.45 ms/step at N=98,304, the large-grid step's dominant
term (docs/DESIGN.md "the gather is a VMEM-capacity story"). Sorting
alone does not help: clustered indices measured exactly as slow
(exp_gather_capacity.py) because XLA still issues one latency-bound
fetch per row.

The idea under test: with agents SORTED by flat cell index, each block
of ``nb`` consecutive agents touches a narrow index window. Per block,
dynamic-slice a W-row window out of the table (a sequential,
BANDWIDTH-bound copy), force its materialization with
optimization_barrier (else XLA folds the slice back into a big-table
gather), and gather from the small window — which is back under the
VMEM budget, i.e. the ~2 ns/row regime. Expected cost model per step:
B·W·rowbytes / 819 GB/s of window traffic + N × ~2 ns + scan overhead.
Correctness: indices that escape their block's window (population
drift since the last sort) are counted; a lax.cond full-table fallback
pays the old price only on steps where any escape exists.

Measures, all chained-scan marginal (two lengths, np.asarray sync):
- baseline full-table gather, bf16 + f32;
- windowed gather at (nb, W) combos, with the index population
  pre-drifted by ``a`` random-walk steps since sorting (a = 0..128)
  plus the in-scan drift, reporting the escape fraction per config;
- argsort + 5-payload permute (the per-resort cost the production
  integration would pay at compaction/chunk boundaries).

Env: TG_N (default 98304), TG_GRID (default 2048) -> table rows =
TG_GRID^2.
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

N = int(os.environ.get('TG_N', 98_304))
GRID = int(os.environ.get('TG_GRID', 2048))
NCELLS = GRID * GRID
S1, S2 = 48, 112

# 9-neighbor flat-index deltas on the GRID-wide raster (the real
# movement model's per-step index change)
DELTAS = np.array([0, 1, -1, GRID, -GRID, GRID + 1, GRID - 1,
                   -GRID + 1, -GRID - 1], np.int32)


def _drift(idx, s):
    """One serialized movement step: delta chosen by the gather result."""
    return jnp.clip(idx + jnp.take(jnp.asarray(DELTAS), s % 9),
                    0, NCELLS - 1)


@functools.partial(jax.jit, static_argnames=('length',))
def _run_full(table, idx0, length: int):
    def body(carry, _):
        idx, acc = carry
        rows = table.at[idx].get(mode='promise_in_bounds')
        s = jnp.sum(rows.astype(jnp.float32), axis=1).astype(jnp.int32)
        return (_drift(idx, s), acc + jnp.sum(s)), None
    (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.int32(0)), None,
                                 length=length)
    return acc + jnp.sum(idx)


@functools.partial(jax.jit, static_argnames=('length', 'nb', 'w'))
def _run_windowed(table, idx0, length: int, nb: int, w: int):
    """Windowed gather; returns (checksum, escaped_step_count)."""
    bcount = idx0.shape[0] // nb

    def gather_windowed(idx):
        blocks = idx.reshape(bcount, nb)
        starts = jnp.clip(jnp.min(blocks, axis=1), 0, NCELLS - w)

        def per_block(carry, inp):
            start, blk = inp
            win = jax.lax.dynamic_slice(table, (start, jnp.int32(0)),
                                        (w, table.shape[1]))
            # without the barrier XLA folds the slice into the gather
            # and we are back to one latency-bound big-table fetch/row
            win = jax.lax.optimization_barrier(win)
            rel = blk - start
            ok = (rel >= 0) & (rel < w)
            rows = win.at[jnp.clip(rel, 0, w - 1)].get(
                mode='promise_in_bounds')
            s = jnp.sum(rows.astype(jnp.float32), axis=1)
            return carry, (s.astype(jnp.int32), ok)

        _, (s, ok) = jax.lax.scan(
            per_block, 0, (starts, blocks.astype(jnp.int32)))
        return s.reshape(-1), ok.reshape(-1)

    def body(carry, _):
        idx, acc, esc = carry
        s, ok = gather_windowed(idx)
        escaped = jnp.sum(~ok)

        # correctness fallback: only executed on steps with escapes
        def slow(s):
            rows = table.at[idx].get(mode='promise_in_bounds')
            return jnp.sum(rows.astype(jnp.float32),
                           axis=1).astype(jnp.int32)
        s = jax.lax.cond(escaped > 0, slow, lambda s: s, s)
        return (_drift(idx, s), acc + jnp.sum(s),
                esc + (escaped > 0).astype(jnp.int32)), None

    (idx, acc, esc), _ = jax.lax.scan(
        body, (idx0, jnp.int32(0), jnp.int32(0)), None, length=length)
    return acc + jnp.sum(idx), esc


def _timed(go):
    go(S1); go(S2)  # compile both lengths
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    return (t_b - t_a) / (S2 - S1)


def _sorted_drifted(rng, age):
    idx = np.sort(rng.choice(NCELLS, N, replace=False).astype(np.int32))
    for _ in range(age):
        idx = np.clip(idx + rng.choice(DELTAS, N), 0, NCELLS - 1)
    return jnp.asarray(idx)


def main():
    print(f'device: {jax.devices()[0]}  N={N}  grid={GRID}^2 '
          f'({NCELLS} rows)', flush=True)
    rng = np.random.default_rng(1)
    t32 = rng.random((NCELLS, 9), np.float32)

    for dt in ('bf16', 'f32'):
        table = jnp.asarray(t32).astype(
            dict(bf16=jnp.bfloat16, f32=jnp.float32)[dt])
        idx0 = _sorted_drifted(rng, 0)
        per = _timed(lambda L: np.asarray(_run_full(table, idx0, L)))
        print(f'full-gather {dt:4s}                     '
              f'{per*1e6:9.1f} us/step {per/N*1e9:6.2f} ns/row',
              flush=True)

        for nb, w in ((1024, 65536), (1024, 131072), (512, 65536),
                      (2048, 131072)):
            nb, w = min(nb, N), min(w, NCELLS)  # tiny-smoke clamp
            for age in (0, 32, 128):
                idx0 = _sorted_drifted(np.random.default_rng(2), age)
                per = _timed(lambda L: np.asarray(
                    _run_windowed(table, idx0, L, nb, w)[0]))
                _, esc = _run_windowed(table, idx0, S1, nb, w)
                mb = (N // nb) * w * table.dtype.itemsize * 9 / 1e6
                print(f'windowed {dt:4s} nb={nb:5d} W={w:6d} age={age:3d}'
                      f' {per*1e6:9.1f} us/step {per/N*1e9:6.2f} ns/row'
                      f'  win-traffic {mb:6.0f} MB/step'
                      f'  escape-steps {int(esc)}/{S1}', flush=True)

    # resort cost: argsort + permute the scan state's 5 payload arrays
    idx = jnp.asarray(rng.integers(0, NCELLS, N, dtype=np.int32))
    payloads = [jnp.asarray(rng.integers(0, 127, N, dtype=np.int32))
                for _ in range(5)]

    @jax.jit
    def resort(idx, payloads):
        order = jnp.argsort(idx)
        return idx[order], [p[order] for p in payloads]

    def go_sort(reps):
        x, ps = idx, payloads
        for _ in range(reps):
            x, ps = resort(x, ps)
        np.asarray(x)
    go_sort(1); go_sort(8)
    t0 = time.perf_counter(); go_sort(1); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); go_sort(8); tb = time.perf_counter() - t0
    print(f'argsort+permute(5 payloads)        {(tb-ta)/7*1e6:9.1f} us',
          flush=True)


if __name__ == '__main__':
    main()

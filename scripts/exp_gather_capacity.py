"""The weight-table gather is a VMEM-CAPACITY story, not an issue-rate
constant (round 4, supersedes exp_gather.py's flagship-only reading).

Measured on v5e (chained scan, marginal between two lengths,
np.asarray sync):

- tables that fit the gather op's VMEM working set are fetched at
  ~1.8-2.0 ns/row regardless of dtype (u8 = bf16 at 300k rows; u8 at
  700k rows) — XLA stages the table into VMEM and the gather runs at
  its VMEM issue rate;
- past the capacity boundary the rate cliffs to a FLAT ~14.8 ns/row
  (bf16) / ~20 ns/row (f32) that is independent of table size (12.6 MB
  = 75.6 MB) AND of the accessed working set (indices clustered into a
  64k-cell window gather exactly as slow as uniform-random ones):
  HBM random-access latency, not bandwidth and not locality;
- the boundary sits between 5.4 MB (fast) and 12.6 MB (slow), with
  9 MB measured mid-cliff (~9 ns/row) — consistent with ~6-8 MB of the
  16 MB VMEM being usable by the gather fusion.

Consequences (docs/DESIGN.md "the gather is a VMEM-capacity story"):
the flagship 500x600 bf16 gather (5.4 MB) is a VMEM gather; the SAME
grid with the fidelity-default float32 table (10.8 MB) falls off the
cliff and pays ~10x on the dominant per-step cost; and at 2048^2+ every
dtype is HBM-resident, which is the measured large-grid floor
(98,304 rows x 14.8 ns = 1.45 ms/step).

Env: GC_N (default 98304).
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

N = int(os.environ.get('GC_N', 98_304))
S1, S2 = 96, 224


@functools.partial(jax.jit, static_argnames=('length',))
def _run(table, idx0, length: int):
    def body(carry, _):
        idx, acc = carry
        rows = table.at[idx].get(mode='promise_in_bounds')
        s = jnp.sum(rows.astype(jnp.float32), axis=1).astype(jnp.int32)
        # next indices depend on the gather so steps serialize, and the
        # +0..7 drift keeps clustered index sets clustered
        idx = (idx + (s & 7)) % table.shape[0]
        return (idx, acc + jnp.sum(s)), None

    (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.int32(0)), None,
                                 length=length)
    return acc + jnp.sum(idx)


def bench(label, table, idx0):
    def go(length):
        np.asarray(_run(table, idx0, length))

    go(S1); go(S2)
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    mb = table.size * table.dtype.itemsize / 1e6
    print(f'{label:34s} ({mb:6.1f} MB) {per*1e6:9.1f} us/step '
          f'{per/N*1e9:6.2f} ns/row', flush=True)


def _table(rows, dt):
    t32 = np.random.default_rng(0).random((rows, 9), np.float32)
    if dt == 'u8':
        return jnp.asarray((t32 * 255).astype(np.uint8))
    return jnp.asarray(t32).astype(
        dict(bf16=jnp.bfloat16, f32=jnp.float32)[dt])


def main():
    print(f'device: {jax.devices()[0]}  N={N}', flush=True)
    rng = np.random.default_rng(1)

    print('# size sweep (bf16, uniform-random indices)')
    for rows in (300_000, 500_000, 700_000, 900_000, 1_400_000,
                 2_400_000, 4_200_000):
        idx = jnp.asarray(rng.integers(0, rows, N, dtype=np.int32))
        bench(f'bf16 rows={rows}', _table(rows, 'bf16'), idx)

    print('# dtype at the flagship and mid sizes')
    for rows in (300_000, 700_000):
        idx = jnp.asarray(rng.integers(0, rows, N, dtype=np.int32))
        for dt in ('u8', 'bf16', 'f32'):
            bench(f'{dt} rows={rows}', _table(rows, dt), idx)

    print('# locality at an HBM-resident table (2048^2 bf16)')
    rows = 2048 * 2048
    table = _table(rows, 'bf16')
    bench('uniform-random indices', table,
          jnp.asarray(rng.integers(0, rows, N, dtype=np.int32)))
    bench('sorted indices', table, jnp.asarray(np.sort(
        rng.integers(0, rows, N, dtype=np.int32))))
    bench('clustered into 64k cells', table,
          jnp.asarray(rng.integers(0, 65536, N, dtype=np.int32)))


if __name__ == '__main__':
    main()

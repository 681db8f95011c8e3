"""Honest micro of the per-step 9-float row gather: random vs sorted
indices (locality), bf16 vs u8 vs padded-16 rows. Chained scan +
np.asarray sync.
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

NROW, NCOL = 500, 600
N = 100_000
S1, S2 = 128, 256


def bench(name, table, idx):
    @functools.partial(jax.jit, static_argnames=('length',))
    def run(table, idx, length: int):
        def body(carry, _):
            acc, idx = carry
            g = table.at[idx].get(mode='promise_in_bounds')
            s = jnp.sum(g.astype(jnp.float32), axis=1)
            # derive next indices from the gather so steps chain
            idx = (idx + s.astype(jnp.int32) % 7) % (NROW * NCOL)
            return (acc + jnp.sum(s), idx), ()

        (acc, _), _ = jax.lax.scan(body, (jnp.float32(0.), idx), None,
                                   length=length)
        return acc

    def go(length):
        np.asarray(run(table, idx, length))

    go(S1); go(S2)
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    print(f'{name:40s} {per*1e6:8.1f} us/step', flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f'device: {jax.devices()[0]}  N={N}', flush=True)
    tab32 = rng.random((NROW * NCOL, 9), np.float32).astype(np.float32)
    tab_bf = jnp.asarray(tab32).astype(jnp.bfloat16)
    tab_u8 = jnp.asarray((tab32 * 255).astype(np.uint8))
    tab_pad = jnp.zeros((NROW * NCOL, 16), jnp.bfloat16
                        ).at[:, :9].set(jnp.asarray(tab32).astype(
                            jnp.bfloat16))
    idx_rand = jnp.asarray(rng.integers(0, NROW * NCOL, N), jnp.int32)
    idx_sort = jnp.sort(idx_rand)

    bench('bf16 (cells,9) random idx', tab_bf, idx_rand)
    bench('bf16 (cells,9) sorted idx', tab_bf, idx_sort)
    bench('u8   (cells,9) random idx', tab_u8, idx_rand)
    bench('bf16 (cells,16) padded random', tab_pad, idx_rand)
    bench('bf16 (cells,16) padded sorted', tab_pad, idx_sort)


if __name__ == '__main__':
    main()

"""What does the one-hot histogram REALLY cost, honestly timed?

DESIGN.md round-2 notes claim the standalone XLA one-hot matmul hist is
41 us/step at 100k agents ("rewritten to a convolution"), while in-scan
it costs ~275-325 us. This probe times the hist op in a chained scan
with nothing else in the body (positions updated by a trivial
arithmetic recurrence so each iteration's hist input differs and cannot
be CSE'd), np.asarray-synced, marginal between two lengths.
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
N = int(os.environ.get('FUSED_N', 98_304))
S1, S2 = 96, 224


def hist_xla(r, c, pres):
    oh_r = (r[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, NROW), 1)).astype(jnp.int8)
    oh_c = (c[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
    upd = jax.lax.dot_general(
        oh_r, oh_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return pres + upd


def hist_pallas(r, c, pres):
    from ssrs_tpu.agents.pallas_hist import presence_histogram
    return pres + presence_histogram(r, c, jnp.ones((N,), jnp.float32),
                                     NROW, NCOL)


def bench(name, hist_fn):
    @functools.partial(jax.jit, static_argnames=('length',))
    def run(length: int):
        r0 = jnp.arange(N, dtype=jnp.int32) % NROW
        c0 = jnp.arange(N, dtype=jnp.int32) % NCOL
        pres0 = jnp.zeros((NROW, NCOL), jnp.int32)

        def body(carry, _):
            r, c, pres = carry
            r = (r + 7) % NROW          # trivial per-step change
            c = (c + 3) % NCOL
            return (r, c, hist_fn(r, c, pres)), ()

        (r, c, pres), _ = jax.lax.scan(body, (r0, c0, pres0), None,
                                       length=length)
        return jnp.sum(pres) + jnp.sum(r) + jnp.sum(c)

    def go(length):
        np.asarray(run(length))

    go(S1); go(S2)
    t0 = time.perf_counter(); go(S1); t_a = time.perf_counter() - t0
    t0 = time.perf_counter(); go(S2); t_b = time.perf_counter() - t0
    per = (t_b - t_a) / (S2 - S1)
    print(f'{name:32s} {per*1e6:8.1f} us/step  '
          f'{per/N*1e9:6.2f} ns/point', flush=True)


def main():
    print(f'device: {jax.devices()[0]}  N={N}', flush=True)
    bench('XLA one-hot matmul hist', hist_xla)
    bench('pallas per-call hist', hist_pallas)


if __name__ == '__main__':
    main()

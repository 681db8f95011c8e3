"""Probe 2: find the exact 2D dynamic-gather form Mosaic accepts.

Probe 1 (exp_mosaic_gather_probe.py): 'Only 2D gather is supported'
(so SOME form exists in jax 0.9), with a shape-match complaint for
row gathers. Hypothesis: tpu.DynamicGatherOp = take_along_axis where
input, indices and output all share one 2D shape — out[i,j] =
in[idx[i,j], j] (axis 0) or in[i, idx[i,j]] (axis 1). Try both at
tile shape (8,128) and at deep-column shape (512,128).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def attempt(name, shape, axis, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random(shape), dtype)
    idx = jnp.asarray(rng.integers(0, shape[axis], shape), jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...],
                                         axis=axis)

    try:
        got = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(table, idx)
        want = jnp.take_along_axis(table, idx, axis=axis)
        ok = bool(jnp.array_equal(got, want))
        print(f'[{name}] COMPILED, correct={ok}', flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        head = str(e).splitlines()[0] if str(e) else repr(e)
        print(f'[{name}] FAILED: {type(e).__name__}: {head[:240]}',
              flush=True)
        return False


def main():
    print(f'jax {jax.__version__}, devices: {jax.devices()}', flush=True)
    r = {}
    r['tile ax0'] = attempt('tile ax0', (8, 128), 0)
    r['tile ax1'] = attempt('tile ax1', (8, 128), 1)
    r['deep ax0'] = attempt('deep ax0', (512, 128), 0)
    r['deep ax1'] = attempt('deep ax1', (512, 128), 1)
    r['deep ax0 bf16'] = attempt('deep ax0 bf16', (512, 128), 0,
                                 jnp.bfloat16)
    r['wide ax0'] = attempt('wide ax0', (512, 512), 0)
    print('RESULT:', r, flush=True)


if __name__ == '__main__':
    main()

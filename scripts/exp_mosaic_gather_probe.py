"""Capability probe: can CURRENT Mosaic (jax 0.9.x) express a per-lane
dynamic gather from a VMEM-resident table inside a Pallas TPU kernel?

Rounds 3-4 recorded this as unsupported — the reason the fused step
leaves the 9-row weight-table gather in XLA at its ~2 ns/row VMEM
issue rate (204 us of the 404 us step; docs/DESIGN.md "the agent-step
roofline"). Mosaic grows ops release to release, so re-probe before
trusting the old negative.

Three shapes of attempt, smallest first:
  A. jnp.take(table_1d, idx)         — 1D dynamic gather, idx (8,128)
  B. jnp.take(table_2d, idx, axis=0) — row gather (the real need: 9
                                       bf16/f32 weights per lane)
  C. take_along_axis on a (T,128) table with per-lane row indices
     (lane-aligned layout: lane j gathers from column j)

Each attempt compiles + runs on tiny shapes and checks against the
XLA result; failures print the Mosaic error class/message. If any
compiles, a second pass times it at the production block size against
the XLA gather.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def attempt(name, build):
    try:
        got, want = build()
        ok = np.allclose(np.asarray(got), np.asarray(want))
        print(f'[{name}] COMPILED AND RAN, correct={ok}', flush=True)
        return ok
    except Exception as e:  # noqa: BLE001 - we want the Mosaic error text
        msg = str(e).splitlines()
        head = msg[0] if msg else repr(e)
        print(f'[{name}] FAILED: {type(e).__name__}: {head[:300]}',
              flush=True)
        for line in msg[1:6]:
            print(f'    {line[:200]}', flush=True)
        return False


def a_take_1d():
    T = 2048
    table = jnp.arange(T, dtype=jnp.float32) * 0.5
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, T, (8, 128)), jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(t_ref[...], i_ref[...], axis=0)

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(table, idx)
    return got, jnp.take(table, idx, axis=0)


def b_take_rows():
    T, K = 2048, 8
    table = jnp.asarray(
        np.random.default_rng(1).random((T, K)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(2).integers(0, T, (128,)), jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(t_ref[...], i_ref[...], axis=0)

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, K), jnp.float32),
    )(table, idx)
    return got, jnp.take(table, idx, axis=0)


def c_take_along_axis():
    T = 1024
    table = jnp.asarray(
        np.random.default_rng(3).random((T, 128)), jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(4).integers(0, T, (8, 128)), jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(table, idx)
    return got, jnp.take_along_axis(table, idx, axis=0)


def main():
    print(f'jax {jax.__version__}, devices: {jax.devices()}', flush=True)
    results = {
        'A take-1d': attempt('A take-1d', a_take_1d),
        'B take-rows': attempt('B take-rows', b_take_rows),
        'C take-along-axis': attempt('C take-along-axis',
                                     c_take_along_axis),
    }
    print('RESULT:', results, flush=True)


if __name__ == '__main__':
    main()

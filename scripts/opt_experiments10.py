"""Round-2 experiment: (9, N)-transposed step math.

Hypothesis: the production step does all its per-move math on (N, 9)
arrays. TPU vregs are (8 sublanes, 128 lanes); a minor dimension of 9
uses 9/128 lanes — ~7% VPU utilization for every cascade / cumsum /
compare op in the step. Transposing the hot math to (9, N) makes the
minor dim the full agent axis (perfect lane packing) at the cost of one
(N, 9)->(9, N) transpose after the weight gather.

Same semantics as make_step_fn (fallback cascade, inverse-CDF sampling,
memory mask, matmul presence); fixed 100k population, median of reps.
"""

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

from ssrs_tpu.agents.moves import (CENTER_ZERO, NEIGHBOR_DELTAS,
                                   directional_probs, restriction_table)
from ssrs_tpu.agents.simulate import (TrackParams, init_state,
                                      make_step_fn, prepared_weights)

NROW, NCOL = 500, 600
N = 100_000
STEPS = 256
REPS = 5

table_j = jnp.asarray(restriction_table())          # (9, 9) f32
dirp_j = jnp.asarray(directional_probs(0.))         # (9,)
center0_j = jnp.asarray(CENTER_ZERO)                # (9,)
deltas_j = jnp.asarray(NEIGHBOR_DELTAS)             # (9, 2) i32


def fields():
    y = np.linspace(0, np.pi, NROW)[:, None]
    x = np.linspace(0, 2 * np.pi, NCOL)[None, :]
    updraft = (1.0 + 0.8 * np.sin(3 * x) * np.sin(2 * y)).astype(np.float32)
    potential = (np.linspace(1000., 0., NROW)[:, None]
                 * np.ones((1, NCOL))).astype(np.float32)
    return updraft, potential


def make_step_T(base_flat, presence: bool, gather_mode='rowT'):
    """Transposed-math variant of the production step (memory_k=1,
    nu=1, no burn-in branch — agents clipped in the interior so the
    compute path matches the production hot loop)."""
    dirp_c0_T = (dirp_j * center0_j)[:, None]        # (9, 1)
    dirp_T = dirp_j[:, None]
    center0_T = center0_j[:, None]
    table_T = table_j.T                              # (9, 9)
    dr_tab = deltas_j[:, 0]
    dc_tab = deltas_j[:, 1]
    base_planes = base_flat.T.reshape(9, -1) if gather_mode == 'planes' \
        else None

    def step(state):
        pos, mem, presence_map, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        if gather_mode == 'planes':
            pT = jnp.stack([base_planes[k].at[idx].get(
                mode='promise_in_bounds') for k in range(9)]
            ).astype(jnp.float32)                    # (9, N)
        else:
            base = base_flat.at[idx].get(
                mode='promise_in_bounds')            # (N, 9) bf16
            pT = base.T.astype(jnp.float32)          # (9, N)

        maskT = center0_T * jnp.take(table_T, mem[:, 0], axis=1)  # (9, N)

        p = pT * maskT
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_c0_T * maskT, p)
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_T, p)

        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (N,), dtype=p.dtype)
        u = jnp.maximum(u, jnp.finfo(p.dtype).tiny)
        cum = jnp.cumsum(p, axis=0)                  # (9, N)
        mi = jnp.sum(cum < u[None, :] * cum[-1:, :],
                     axis=0).astype(jnp.int32)
        mi = jnp.minimum(mi, 8)

        nr = jnp.clip(r + jnp.take(dr_tab, mi), 1, NROW - 2)
        nc = jnp.clip(c + jnp.take(dc_tab, mi), 1, NCOL - 2)
        new_mem = mi[:, None]

        if presence:
            oh_r = (nr[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NROW), 1)).astype(jnp.int8)
            oh_c = (nc[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
            upd = jax.lax.dot_general(
                oh_r, oh_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            presence_map = presence_map + upd

        return (jnp.stack([nr, nc], 1), new_mem, presence_map, key)

    return step


def bench(name, step_fn, state0):
    @jax.jit
    def run(state):
        return jax.lax.scan(lambda s, _: (step_fn(s), None), state, None,
                            length=STEPS)[0]

    out = run(state0)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(out)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f'{name:40s} {med / STEPS * 1e6:9.1f} us/step '
          f'{N * STEPS / med / 1e6:8.1f} M agent-steps/s', flush=True)


def main():
    rng = np.random.default_rng(0)
    updraft, potential = fields()
    dirp = jnp.asarray(directional_probs(0.))
    table = jnp.asarray(restriction_table())
    starts = np.stack([rng.integers(1, NROW - 1, N),
                       rng.integers(1, NCOL - 1, N)], 1).astype(np.int32)
    params = TrackParams(grid_shape=(NROW, NCOL), move_dirn=0., nu=1.,
                         memory_k=1, burnin=50, nsteps=10_000_000,
                         presence_impl='matmul')
    base_flat = prepared_weights(updraft, potential, dirp,
                                 params.weight_dtype)
    print(f'device: {jax.devices()[0]}  N={N}  reps={REPS}', flush=True)

    # production baseline (same harness)
    step = make_step_fn(params, base_flat, dirp, table)
    bench('production (N,9) + matmul presence', step,
          init_state(params, starts, jax.random.key(0)))

    pos = jnp.asarray(starts)
    mem = jnp.full((N, 1), 4, jnp.int32)
    pmap = jnp.zeros((NROW, NCOL), jnp.int32)
    state_t = (pos, mem, pmap, jax.random.key(0))
    bench('transposed (9,N) + matmul presence',
          make_step_T(base_flat, True), state_t)
    bench('transposed (9,N) no presence',
          make_step_T(base_flat, False), state_t)
    bench('transposed + plane gathers',
          make_step_T(base_flat, True, gather_mode='planes'), state_t)




def make_step_T2(base_flat, *, pad16=False, gather=True, rng=True,
                 presence=True):
    """Transposed step with optional 16-lane-padded table rows (aligned
    32-byte gather rows) and component toggles for ablation."""
    dirp_c0_T = (dirp_j * center0_j)[:, None]
    dirp_T = dirp_j[:, None]
    center0_T = center0_j[:, None]
    table_T = table_j.T
    dr_tab = deltas_j[:, 0]
    dc_tab = deltas_j[:, 1]
    if pad16:
        base_pad = jnp.pad(base_flat, ((0, 0), (0, 7)))
    else:
        base_pad = base_flat

    def step(state):
        pos, mem, presence_map, key = state
        r, c = pos[:, 0], pos[:, 1]
        idx = r * NCOL + c
        if gather:
            rows = base_pad.at[idx].get(mode='promise_in_bounds')
            pT = rows[:, :9].T.astype(jnp.float32)
        else:
            pT = jnp.broadcast_to(dirp_c0_T * 7.0, (9, N))

        maskT = center0_T * jnp.take(table_T, mem[:, 0], axis=1)
        p = pT * maskT
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_c0_T * maskT, p)
        allz = jnp.sum(p, axis=0, keepdims=True) == 0.
        p = jnp.where(allz, dirp_T, p)

        if rng:
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (N,), dtype=p.dtype)
        else:
            u = jnp.full((N,), 0.5, jnp.float32)
        u = jnp.maximum(u, jnp.finfo(p.dtype).tiny)
        cum = jnp.cumsum(p, axis=0)
        mi = jnp.sum(cum < u[None, :] * cum[-1:, :],
                     axis=0).astype(jnp.int32)
        mi = jnp.minimum(mi, 8)

        nr = jnp.clip(r + jnp.take(dr_tab, mi), 1, NROW - 2)
        nc = jnp.clip(c + jnp.take(dc_tab, mi), 1, NCOL - 2)
        new_mem = mi[:, None]
        if presence:
            oh_r = (nr[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NROW), 1)).astype(jnp.int8)
            oh_c = (nc[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, NCOL), 1)).astype(jnp.int8)
            upd = jax.lax.dot_general(
                oh_r, oh_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            presence_map = presence_map + upd
        return (jnp.stack([nr, nc], 1), new_mem, presence_map, key)

    return step


def main2():
    rng = np.random.default_rng(0)
    updraft, potential = fields()
    dirp = jnp.asarray(directional_probs(0.))
    starts = np.stack([rng.integers(1, NROW - 1, N),
                       rng.integers(1, NCOL - 1, N)], 1).astype(np.int32)
    params = TrackParams(grid_shape=(NROW, NCOL), move_dirn=0., nu=1.,
                         memory_k=1, burnin=50, nsteps=10_000_000)
    base_flat = prepared_weights(updraft, potential, dirp,
                                 params.weight_dtype)
    print(f'device: {jax.devices()[0]}  N={N}  reps={REPS}', flush=True)
    pos = jnp.asarray(starts)
    mem = jnp.full((N, 1), 4, jnp.int32)
    pmap = jnp.zeros((NROW, NCOL), jnp.int32)
    st = (pos, mem, pmap, jax.random.key(0))
    bench('T2 baseline', make_step_T2(base_flat), st)
    bench('T2 pad16 gather', make_step_T2(base_flat, pad16=True), st)
    bench('T2 no gather', make_step_T2(base_flat, gather=False), st)
    bench('T2 no rng', make_step_T2(base_flat, rng=False), st)
    bench('T2 no gather no rng no presence',
          make_step_T2(base_flat, gather=False, rng=False,
                       presence=False), st)


if __name__ == '__main__':
    main2() if '2' in sys.argv[1:] else main()

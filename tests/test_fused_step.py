"""Fused Pallas agent-step kernel tests (interpret mode on CPU).

The fused kernel (agents/fused_step.py) must be BIT-EXACT against the
XLA step for the same per-agent uniforms at nu=1 (identical f32
operation order), and the delayed-histogram bookkeeping (flush at end +
at compaction) must reproduce the XLA engine's presence counts exactly
through every driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssrs_tpu.agents.simulate import (SimState, TrackParams,
                                      flush_pending, init_state,
                                      make_step_fn, prepared_weights,
                                      simulate_presence,
                                      simulate_presence_compacting)
from ssrs_tpu.agents.moves import directional_probs, restriction_table

GRID = (48, 56)
N = 2048  # multiple of FUSED_BLK


def _params(nsteps=150, nu=1., k=2, step_impl='fused-interpret'):
    return TrackParams(grid_shape=GRID, move_dirn=0., nu=nu, memory_k=k,
                       burnin=4, nsteps=nsteps, weight_dtype='float32',
                       step_impl=step_impl)


def _fields(rng):
    nrow, ncol = GRID
    up = (0.5 + rng.random((nrow, ncol))).astype(np.float32)
    pot = (np.linspace(1000., 0., nrow)[:, None]
           * np.ones((1, ncol), np.float32))
    return up, pot


def _starts(n, rng):
    return np.stack([rng.integers(3, 8, n), rng.integers(10, 46, n)],
                    axis=1).astype(np.int32)


def _table_and_step(params, up, pot):
    dirp = jnp.asarray(directional_probs(params.move_dirn))
    table = jnp.asarray(restriction_table())
    base = prepared_weights(jnp.asarray(up), jnp.asarray(pot), dirp,
                            params.weight_dtype)
    return make_step_fn(params, base, dirp, table)


@pytest.mark.parametrize('k', [0, 1, 3])
def test_fused_step_bit_exact_vs_xla(rng, k):
    """Same uniforms -> identical positions, memory, alive, and
    presence after several steps + flush (nu=1: identical op order)."""
    up, pot = _fields(rng)
    starts = _starts(N, rng)
    pf = _params(k=k)
    px = pf._replace(step_impl='xla')
    step_f = _table_and_step(pf, up, pot)
    step_x = _table_and_step(px, up, pot)
    sf = init_state(pf, starts, jax.random.key(0))
    sx = init_state(px, starts, jax.random.key(0))
    for t in range(12):
        u = jnp.asarray(rng.random(N).astype(np.float32))
        sf = step_f(sf, u=u)
        sx = step_x(sx, u=u)
    sf = flush_pending(pf, sf)
    sx = flush_pending(px, sx)
    np.testing.assert_array_equal(np.asarray(sf.pos_r),
                                  np.asarray(sx.pos_r))
    np.testing.assert_array_equal(np.asarray(sf.pos_c),
                                  np.asarray(sx.pos_c))
    np.testing.assert_array_equal(np.asarray(sf.mem), np.asarray(sx.mem))
    np.testing.assert_array_equal(np.asarray(sf.alive),
                                  np.asarray(sx.alive))
    np.testing.assert_array_equal(np.asarray(sf.presence),
                                  np.asarray(sx.presence))


def test_fused_simulate_presence_matches_xla(rng):
    """End-to-end through the jitted driver: identical presence and step
    counts (same key stream feeds both engines)."""
    up, pot = _fields(rng)
    starts = _starts(N, rng)
    p_f, s_f = simulate_presence(_params(), starts, jax.random.key(7),
                                 updraft=up, potential=pot, chunk=32)
    p_x, s_x = simulate_presence(_params(step_impl='xla'), starts,
                                 jax.random.key(7), updraft=up,
                                 potential=pot, chunk=32)
    assert int(s_f) == int(s_x)
    np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))


def test_fused_compacting_driver_flushes_correctly(rng):
    """The compacting driver (flush at compaction + tail) must conserve
    the exact presence total: every agent contributes exactly its number
    of alive steps + 1 (the start)."""
    up, pot = _fields(rng)
    n = 2048
    starts = _starts(n, rng)
    params = _params(nsteps=120)
    p_f, s_f = simulate_presence_compacting(
        params, starts, jax.random.key(3), updraft=up, potential=pot,
        chunk=32, min_bucket=1024)
    p_x, s_x = simulate_presence_compacting(
        params._replace(step_impl='xla'), starts, jax.random.key(3),
        updraft=up, potential=pot, chunk=32, min_bucket=1024)
    assert int(s_f) == int(s_x)
    np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))


def test_fused_pads_odd_population(rng):
    """A population that is not a multiple of FUSED_BLK is padded with
    dead agents that contribute nothing."""
    up, pot = _fields(rng)
    n = 700
    starts = _starts(n, rng)
    params = _params(nsteps=60)
    p_f, _ = simulate_presence_compacting(
        params, starts, jax.random.key(1), updraft=up, potential=pot,
        chunk=16, min_bucket=1024)
    p_x, _ = simulate_presence_compacting(
        params._replace(step_impl='xla'), starts, jax.random.key(1),
        updraft=up, potential=pot, chunk=16, min_bucket=1024)
    np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))


def test_delayed_hist_total_is_conserved(rng):
    """Presence total == sum over agents of (1 start + alive steps):
    the delayed accumulation misses nothing at the end of a run."""
    up, pot = _fields(rng)
    starts = _starts(N, rng)
    params = _params(step_impl='xla', nsteps=400)
    p, s = simulate_presence(params, starts, jax.random.key(5),
                             updraft=up, potential=pot, chunk=64,
                             record_tracks=False)
    # run again with track recording to get exact lengths
    p2, s2, tracks, lengths = simulate_presence(
        params, starts, jax.random.key(5), updraft=up, potential=pot,
        record_tracks=True)
    assert int(np.asarray(p2).sum()) == int(np.asarray(lengths).sum())
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p2))


def test_fused_nu_statistical(rng):
    """nu != 1 uses exp/log in the kernel vs jnp.power in XLA — bitwise
    parity is not guaranteed, but the sampled distributions must agree
    statistically."""
    from ssrs_tpu.agents.presence import smooth_presence
    up, pot = _fields(rng)
    starts = _starts(4096, rng)
    p_f, _ = simulate_presence(_params(nu=2., nsteps=200), starts,
                               jax.random.key(2), updraft=up,
                               potential=pot, chunk=64)
    p_x, _ = simulate_presence(_params(nu=2., nsteps=200,
                                       step_impl='xla'), starts,
                               jax.random.key(2), updraft=up,
                               potential=pot, chunk=64)
    a = np.asarray(smooth_presence(np.asarray(p_f), 3), np.float64)
    b = np.asarray(smooth_presence(np.asarray(p_x), 3), np.float64)
    a /= a.sum()
    b /= b.sum()
    assert np.abs(a - b).sum() < 0.08

def test_fused_presence_impl_none_stays_zero(rng):
    """presence_impl='none' must accumulate nothing through the fused
    engine's compacting driver (regression: flush_pending ignored 'none'
    and histogrammed compaction-boundary snapshots)."""
    up, pot = _fields(rng)
    starts = _starts(N, rng)
    params = _params(nsteps=80)._replace(presence_impl='none')
    p, s = simulate_presence_compacting(
        params, starts, jax.random.key(5), updraft=up, potential=pot,
        chunk=16, min_bucket=1024)
    assert int(s) > 0
    assert int(np.asarray(p).sum()) == 0


def test_fused_accepts_list_starts(rng):
    """List-of-pairs starts through the fused driver (regression:
    _pad_starts dereferenced .shape before converting to an array)."""
    up, pot = _fields(rng)
    starts_np = _starts(700, rng)  # odd size: forces the padding branch
    params = _params(nsteps=40)
    p_list, _ = simulate_presence_compacting(
        params, starts_np.tolist(), jax.random.key(9), updraft=up,
        potential=pot, chunk=16, min_bucket=1024)
    p_np, _ = simulate_presence_compacting(
        params, starts_np, jax.random.key(9), updraft=up,
        potential=pot, chunk=16, min_bucket=1024)
    np.testing.assert_array_equal(np.asarray(p_list), np.asarray(p_np))


def test_fused_interpret_odd_size_falls_back_to_xla(rng):
    """simulate_presence with step_impl='fused-interpret' and an agent
    count that is not a multiple of FUSED_BLK must fall back to the XLA
    engine instead of tripping the kernel's block-divisibility assert."""
    up, pot = _fields(rng)
    starts = _starts(600, rng)
    p_f, s_f = simulate_presence(_params(nsteps=40), starts,
                                 jax.random.key(4), updraft=up,
                                 potential=pot, chunk=16)
    p_x, s_x = simulate_presence(_params(nsteps=40, step_impl='xla'),
                                 starts, jax.random.key(4), updraft=up,
                                 potential=pot, chunk=16)
    assert int(s_f) == int(s_x)
    np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))


@pytest.mark.parametrize('grid,expected_matmul', [
    ((640, 1024), True),    # hybrid, small-sum grid -> matmul histogram
    ((8, 4224), False),     # hybrid, nrow+ncol > 4096 -> scatter
])
def test_fused_hybrid_large_grid_bit_exact(rng, grid, expected_matmul):
    """Grids whose padded histogram exceeds the VMEM budget run the
    HYBRID regime: fused cascade/sampler with hist_mode='none' (tiny
    placeholder output) + the presence_impl-policy histogram outside the
    kernel. Must stay bit-exact against the XLA step."""
    from ssrs_tpu.agents.simulate import _fused_fits
    nrow, ncol = grid
    pf = _params(k=1)._replace(grid_shape=grid)
    assert not _fused_fits(pf)
    assert ((pf.presence_impl in ('auto', 'matmul')
             and nrow + ncol <= 4096) == expected_matmul)
    px = pf._replace(step_impl='xla')
    up = (0.5 + rng.random(grid)).astype(np.float32)
    pot = (np.linspace(1000., 0., nrow)[:, None]
           * np.ones((1, ncol), np.float32))
    starts = np.stack([rng.integers(2, max(3, nrow - 2), N),
                       rng.integers(2, ncol - 2, N)],
                      axis=1).astype(np.int32)
    step_f = _table_and_step(pf, up, pot)
    step_x = _table_and_step(px, up, pot)
    sf = init_state(pf, starts, jax.random.key(0))
    sx = init_state(px, starts, jax.random.key(0))
    for _ in range(8):
        u = jnp.asarray(rng.random(N).astype(np.float32))
        sf = step_f(sf, u=u)
        sx = step_x(sx, u=u)
    sf = flush_pending(pf, sf)
    sx = flush_pending(px, sx)
    np.testing.assert_array_equal(np.asarray(sf.pos_r),
                                  np.asarray(sx.pos_r))
    np.testing.assert_array_equal(np.asarray(sf.pos_c),
                                  np.asarray(sx.pos_c))
    np.testing.assert_array_equal(np.asarray(sf.presence),
                                  np.asarray(sx.presence))


def test_unknown_presence_impl_raises(rng):
    """Pruned/typo presence_impl values must raise, not silently run the
    scatter path under the wrong label."""
    up, pot = _fields(rng)
    starts = _starts(N, rng)
    params = _params(nsteps=10)._replace(presence_impl='chunk-hist')
    with pytest.raises(ValueError, match='chunk-hist'):
        simulate_presence_compacting(
            params, starts, jax.random.key(0), updraft=up, potential=pot,
            chunk=8, min_bucket=1024)

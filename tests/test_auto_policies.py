"""Round-5 auto policies: weight-precision 'auto' tier (VERDICT r4
item 4) and the fused-entry auto-pad (VERDICT r4 item 7)."""

import jax.numpy as jnp
import numpy as np

from ssrs_tpu.agents.simulate import (FUSED_BLK, GATHER_VMEM_BUDGET,
                                      TrackParams, prepare_starts,
                                      prepared_weights,
                                      resolve_weight_dtype,
                                      simulate_presence)
from ssrs_tpu.agents.moves import directional_probs


def test_presence_matmul_area_policy():
    """presence 'auto' picks the one-hot matmul by grid AREA (measured
    ~1.1M-cell crossover, docs/DESIGN.md 'the presence-policy
    boundaries, measured') — the old nrow+ncol<=4096 rule kept the
    matmul all the way to 2048^2, a measured 1.3-2.6x per-step loss."""
    from ssrs_tpu.agents.simulate import _presence_matmul_ok
    assert _presence_matmul_ok((500, 600))
    assert _presence_matmul_ok((1024, 1024))
    assert not _presence_matmul_ok((1100, 1100))
    assert not _presence_matmul_ok((1200, 1400))
    # the old criterion's failure case: row+col == 4096 but 4.19M cells
    assert not _presence_matmul_ok((2048, 2048))
    # tall-thin grids with small area keep the matmul even at large
    # row+col (the dimension the old rule punished for no reason)
    assert _presence_matmul_ok((4000, 250))


def test_step_impl_typo_raises():
    """A step_impl typo must raise, not silently downgrade to XLA."""
    import pytest
    from ssrs_tpu.agents.simulate import resolve_step_impl
    p = TrackParams(grid_shape=(50, 60), move_dirn=0., nu=1.,
                    memory_k=1, burnin=5, nsteps=100,
                    step_impl='fuesd')
    with pytest.raises(ValueError, match='fuesd'):
        resolve_step_impl(p, True)


def test_steps_counter_saturates_at_cap(rng):
    """The reported steps_taken must not overshoot params.nsteps even
    though the chunked drivers run whole chunks (the counter used to
    free-run to the next chunk boundary)."""
    nrow, ncol = 40, 48
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=4, nsteps=100,
                         step_impl='xla')
    updraft = jnp.asarray(rng.random((nrow, ncol), np.float32) + 0.5)
    potential = jnp.asarray(np.linspace(1000., 0., nrow)[:, None]
                            * np.ones((1, ncol), np.float32))
    starts = np.stack([np.full(64, nrow // 2), np.full(64, ncol // 2)],
                      axis=1).astype(np.int32)
    import jax
    _, steps = simulate_presence(params, starts, jax.random.key(0),
                                 updraft=updraft, potential=potential,
                                 chunk=64)
    assert int(steps) <= params.nsteps


def test_resolve_weight_dtype_policy():
    # explicit tiers pass through at any size
    assert resolve_weight_dtype('float32', (4096, 4096)) == 'float32'
    assert resolve_weight_dtype('bfloat16', (16, 16)) == 'bfloat16'
    # auto: f32 while the f32 table fits the measured gather budget
    assert resolve_weight_dtype('auto', (100, 100)) == 'float32'
    # the flagship 500x600 f32 table is 10.8 MB — past the budget
    assert resolve_weight_dtype('auto', (500, 600)) == 'bfloat16'
    # boundary: exactly at the budget stays f32
    n = GATHER_VMEM_BUDGET // (9 * 4)
    assert resolve_weight_dtype('auto', (1, n)) == 'float32'
    assert resolve_weight_dtype('auto', (1, n + 1)) == 'bfloat16'


def test_prepared_weights_auto_resolves_by_grid(rng):
    dirp = jnp.asarray(directional_probs(0.))
    small = jnp.asarray(rng.random((40, 50), dtype=np.float32))
    pot = jnp.zeros((40, 50), jnp.float32)
    assert prepared_weights(small, pot, dirp, 'auto').dtype == jnp.float32
    big = jnp.asarray(rng.random((500, 600), dtype=np.float32))
    potb = jnp.zeros((500, 600), jnp.float32)
    assert prepared_weights(big, potb, dirp, 'auto').dtype == jnp.bfloat16


def test_prepared_weights_batch_matches_per_case(rng):
    """One-dispatch multi-case table build == per-case builds."""
    from ssrs_tpu.agents import prepared_weights_batch
    grid = (30, 40)
    ups = np.stack([(0.5 + rng.random(grid)).astype(np.float32)
                    for _ in range(3)])
    pots = np.stack([(np.linspace(100. * (i + 1), 0., grid[0])[:, None]
                      * np.ones((1, grid[1]), np.float32))
                     for i in range(3)])
    dirps = np.stack([directional_probs(d) for d in (0., 90., 215.)])
    batch = prepared_weights_batch(jnp.asarray(ups), jnp.asarray(pots),
                                   jnp.asarray(dirps), 'float32')
    for i in range(3):
        one = prepared_weights(jnp.asarray(ups[i]), jnp.asarray(pots[i]),
                               jnp.asarray(dirps[i]), 'float32')
        np.testing.assert_array_equal(np.asarray(batch[i]),
                                      np.asarray(one))


def _odd_setup(rng, n=1000):
    grid = (48, 56)
    up = (0.5 + rng.random(grid)).astype(np.float32)
    pot = (np.linspace(1000., 0., grid[0])[:, None]
           * np.ones((1, grid[1]), np.float32))
    starts = np.stack([rng.integers(3, 8, n), rng.integers(10, 46, n)],
                      axis=1).astype(np.int32)
    params = TrackParams(grid_shape=grid, move_dirn=0., nu=1.,
                         memory_k=1, burnin=4, nsteps=96,
                         weight_dtype='float32',
                         step_impl='fused-interpret')
    return params, up, pot, starts


def test_simulate_presence_autopads_odd_n(rng):
    """Odd-N through the jitted entry == manual prepare_starts padding
    (bit-exact: identical padded shapes and key), i.e. the entry now
    runs the fused engine instead of silently downgrading to XLA."""
    import jax
    params, up, pot, starts = _odd_setup(rng)
    assert starts.shape[0] % FUSED_BLK != 0
    key = jax.random.key(7)
    p_auto, s_auto = simulate_presence(params, starts, key,
                                       updraft=jnp.asarray(up),
                                       potential=jnp.asarray(pot))
    starts_p, valid = prepare_starts(params, starts)
    assert starts_p.shape[0] % FUSED_BLK == 0
    p_man, s_man = simulate_presence(params, jnp.asarray(starts_p), key,
                                     updraft=jnp.asarray(up),
                                     potential=jnp.asarray(pot),
                                     valid=jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(p_auto), np.asarray(p_man))
    assert int(s_auto) == int(s_man)


def test_simulate_presence_autopad_slices_tracks(rng):
    """record_tracks output comes back at the caller's N, not the
    padded bucket."""
    import jax
    params, up, pot, starts = _odd_setup(rng, n=1100)
    out = simulate_presence(params, starts, jax.random.key(3),
                            updraft=jnp.asarray(up),
                            potential=jnp.asarray(pot),
                            record_tracks=True)
    presence, steps, tracks, lengths = out
    assert tracks.shape[1] == 1100
    assert lengths.shape[0] == 1100
    np.testing.assert_array_equal(np.asarray(tracks[0]), starts)

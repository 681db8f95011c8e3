"""Tests for the batched multi-case (direction sweep) simulation."""

import jax
import jax.numpy as jnp
import numpy as np

from ssrs_tpu.agents import (TrackParams, directional_probs,
                             prepared_weights, simulate_presence,
                             simulate_presence_cases)

GRID = (48, 56)


def _params(nsteps=150):
    return TrackParams(grid_shape=GRID, move_dirn=0., nu=1., memory_k=1,
                       burnin=int(min(GRID) / 10), nsteps=nsteps)


def test_direction_sweep_shapes_and_drift(rng):
    nrow, ncol = GRID
    y = np.linspace(0, np.pi, nrow)[:, None]
    x = np.linspace(0, 2 * np.pi, ncol)[None, :]
    updraft = (1.0 + 0.8 * np.sin(x) * np.sin(y)).astype(np.float32)
    params = _params()

    dirns = [0., 90.]
    dirps = np.stack([directional_probs(d) for d in dirns])
    # direction-0 potential: northward ramp; direction-90: eastward ramp
    pot_n = (np.linspace(1000., 0., nrow)[:, None]
             * np.ones((1, ncol))).astype(np.float32)
    pot_e = (np.ones((nrow, 1))
             * np.linspace(1000., 0., ncol)[None, :]).astype(np.float32)
    tables = jnp.stack([
        prepared_weights(updraft, pot_n, jnp.asarray(dirps[0]),
                         'bfloat16'),
        prepared_weights(updraft, pot_e, jnp.asarray(dirps[1]),
                         'bfloat16')])

    n = 600
    starts = np.stack([rng.integers(20, 28, n), rng.integers(24, 32, n)],
                      axis=1).astype(np.int32)
    keys = jax.random.split(jax.random.key(0), 2)
    presence, steps = simulate_presence_cases(
        params, tables, jnp.asarray(dirps), jnp.asarray(starts), keys)
    presence = np.asarray(presence)
    assert presence.shape == (2, nrow, ncol)
    # case 0 drifts north (mass in the north half beyond the south half)
    north_mass = presence[0, nrow // 2:, :].sum()
    south_mass = presence[0, :nrow // 2, :].sum()
    assert north_mass > south_mass
    # case 1 drifts east
    east_mass = presence[1, :, ncol // 2:].sum()
    west_mass = presence[1, :, :ncol // 2].sum()
    assert east_mass > west_mass


def test_sweep_case_matches_single(rng):
    """A single-case sweep must reproduce the single-case engine exactly
    (same key, same table)."""
    nrow, ncol = GRID
    updraft = np.ones(GRID, np.float32)
    pot = (np.linspace(1000., 0., nrow)[:, None]
           * np.ones((1, ncol))).astype(np.float32)
    params = _params()
    dirp = jnp.asarray(directional_probs(0.))
    table = prepared_weights(updraft, pot, dirp, 'bfloat16')

    n = 300
    starts = np.stack([rng.integers(4, 8, n), rng.integers(20, 30, n)],
                      axis=1).astype(np.int32)
    key = jax.random.key(7)
    p_single, _ = simulate_presence(params, starts, key, updraft=updraft,
                                    potential=pot)
    p_sweep, _ = simulate_presence_cases(
        params, table[None], dirp[None], jnp.asarray(starts), key[None])
    np.testing.assert_array_equal(np.asarray(p_single),
                                  np.asarray(p_sweep)[0])

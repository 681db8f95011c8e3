"""Statistical oracle agreement for non-default movement parameters:
sharpening exponent nu != 1 and direction-memory depth K=2 — the
parameter axes the default-config tests don't cover."""

import jax
import numpy as np
import pytest

from ssrs_tpu.agents import TrackParams, simulate_presence
from ssrs_tpu.agents.presence import smooth_presence
from oracle_agents import simulate_tracks_numpy

GRID = (48, 56)
BURNIN = int(min(GRID) / 10)


def _fields():
    nrow, ncol = GRID
    y = np.linspace(0, np.pi, nrow)[:, None]
    x = np.linspace(0, 2 * np.pi, ncol)[None, :]
    updraft = (1.0 + 0.8 * np.sin(x) * np.sin(y)).astype(np.float32)
    potential = (np.linspace(1000., 0., nrow)[:, None]
                 * np.ones((1, ncol))).astype(np.float32)
    return updraft, potential


def _compare(nu, memory_k, rng, seed_np, seed_jax, l1_budget=0.10):
    updraft, potential = _fields()
    params = TrackParams(grid_shape=GRID, move_dirn=0., nu=nu,
                         memory_k=memory_k, burnin=BURNIN, nsteps=150)
    n = 3000
    starts = np.stack([rng.integers(3, 6, n), rng.integers(20, 36, n)],
                      axis=1).astype(np.int32)
    presence, _ = simulate_presence(params, starts,
                                    jax.random.key(seed_jax),
                                    updraft=updraft, potential=potential)
    counts_np, _ = simulate_tracks_numpy(
        starts, GRID, 0., nu, memory_k, 150,
        np.random.default_rng(seed_np), updraft=updraft,
        potential=potential)
    a = np.asarray(smooth_presence(np.asarray(presence), 3), np.float64)
    b = np.asarray(smooth_presence(counts_np.astype(np.int32), 3),
                   np.float64)
    a /= a.sum()
    b /= b.sum()
    return np.abs(a - b).sum()


def test_nu_2_matches_oracle(rng):
    l1 = _compare(2.0, 1, rng, 11, 12)
    assert l1 < 0.10, f'nu=2 presence L1 {l1}'


def test_nu_half_matches_oracle(rng):
    l1 = _compare(0.5, 1, rng, 21, 22)
    assert l1 < 0.10, f'nu=0.5 presence L1 {l1}'


def test_memory2_matches_oracle(rng):
    l1 = _compare(1.0, 2, rng, 31, 32)
    assert l1 < 0.10, f'memory_k=2 presence L1 {l1}'


def test_nu_zero_pure_random_walk(rng):
    """nu=0: uniform over all 9 moves including stand-still (the NumPy
    0**0==1 quirk); agents diffuse with no drift."""
    updraft, potential = _fields()
    params = TrackParams(grid_shape=GRID, move_dirn=0., nu=0.,
                         memory_k=1, burnin=BURNIN, nsteps=100)
    n = 2000
    start_row = GRID[0] // 2
    starts = np.stack([np.full(n, start_row),
                       rng.integers(20, 36, n)], axis=1).astype(np.int32)
    presence, steps, tracks, lengths = simulate_presence(
        params, starts, jax.random.key(40), updraft=updraft,
        potential=potential, record_tracks=True)
    tracks = np.asarray(tracks)
    lengths = np.asarray(lengths)
    finals = tracks[np.minimum(lengths - 1, 100), np.arange(n)]
    # no systematic drift: mean displacement small relative to spread
    disp = finals[:, 0].astype(float) - start_row
    assert abs(disp.mean()) < disp.std()

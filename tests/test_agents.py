"""Tests for the lockstep agent-simulation engine: determinism, counting
invariants, boundary semantics, and statistical agreement with the
sequential NumPy oracle."""

import jax
import numpy as np
import pytest

from ssrs_tpu.agents import TrackParams, simulate_presence
from ssrs_tpu.agents.presence import smooth_presence
from oracle_agents import simulate_tracks_numpy

GRID = (48, 56)
BURNIN = int(min(GRID) / 10)


def _params(nsteps=200, move_dirn=0., nu=1., memory_k=1):
    return TrackParams(grid_shape=GRID, move_dirn=move_dirn, nu=nu,
                       memory_k=memory_k, burnin=BURNIN, nsteps=nsteps)


def _starts(n, rng, lo=18, hi=30):
    rows = rng.integers(3, 6, size=n)
    cols = rng.integers(lo, hi, size=n)
    return np.stack([rows, cols], axis=1).astype(np.int32)


def _updraft_potential():
    """Smooth updraft + a potential ramp decreasing northward (so
    direction-0 fluidflow agents drift north)."""
    nrow, ncol = GRID
    y = np.linspace(0, np.pi, nrow)[:, None]
    x = np.linspace(0, 2 * np.pi, ncol)[None, :]
    updraft = (1.0 + 0.8 * np.sin(x) * np.sin(y)).astype(np.float32)
    potential = np.linspace(1000., 0., nrow)[:, None] * np.ones(
        (1, ncol), np.float32)
    return updraft, potential.astype(np.float32)


def test_deterministic_given_key(rng):
    starts = _starts(64, rng)
    key = jax.random.key(7)
    p1, s1 = simulate_presence(_params(), starts, key)
    p2, s2 = simulate_presence(_params(), starts, key)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_different_keys_differ(rng):
    starts = _starts(64, rng)
    p1, _ = simulate_presence(_params(), starts, jax.random.key(1))
    p2, _ = simulate_presence(_params(), starts, jax.random.key(2))
    assert (np.asarray(p1) != np.asarray(p2)).any()


def test_presence_counting_invariant(rng):
    """Total presence = N starts + total moves made; every track moves at
    least burnin steps (no deaths during burn-in)."""
    n = 128
    starts = _starts(n, rng)
    nsteps = 150
    presence, steps, tracks, lengths = simulate_presence(
        _params(nsteps=nsteps), starts, jax.random.key(3),
        record_tracks=True)
    presence = np.asarray(presence)
    lengths = np.asarray(lengths)
    assert presence.sum() == lengths.sum()
    assert (lengths >= BURNIN + 1).all()
    assert (lengths <= nsteps + 1).all()


def test_tracks_stay_in_grid_and_terminate(rng):
    n = 96
    starts = _starts(n, rng)
    nsteps = 400
    presence, steps, tracks, lengths = simulate_presence(
        _params(nsteps=nsteps), starts, jax.random.key(11),
        record_tracks=True)
    tracks = np.asarray(tracks)  # (nsteps+1, N, 2)
    lengths = np.asarray(lengths)
    nrow, ncol = GRID
    assert tracks[..., 0].min() >= 0 and tracks[..., 0].max() <= nrow - 1
    assert tracks[..., 1].min() >= 0 and tracks[..., 1].max() <= ncol - 1
    # a terminated track's last live position is on the boundary
    for i in range(n):
        if lengths[i] < nsteps + 1:  # died before the cap
            last = tracks[lengths[i] - 1, i]
            assert (last[0] in (0, nrow - 1)) or (last[1] in (0, ncol - 1)), \
                f'track {i} ended interior at {last} len {lengths[i]}'


def test_drw_drifts_along_track_direction(rng):
    """Direction 0 (north) random walk: mean row of final positions must
    be far north of the start rows."""
    starts = _starts(256, rng)
    nsteps = 120
    _, _, tracks, lengths = simulate_presence(
        _params(nsteps=nsteps, move_dirn=0.), starts, jax.random.key(5),
        record_tracks=True)
    tracks = np.asarray(tracks)
    lengths = np.asarray(lengths)
    finals = tracks[np.minimum(lengths - 1, nsteps), np.arange(256)]
    assert finals[:, 0].mean() > starts[:, 0].mean() + 20


def test_drw_presence_matches_numpy_oracle(rng):
    """Statistical equivalence of the DRW process: smoothed presence maps
    from the device engine vs the sequential NumPy oracle."""
    n = 3000
    starts = _starts(n, rng)
    nsteps = 150
    params = _params(nsteps=nsteps, move_dirn=0., nu=1., memory_k=1)
    presence, _ = simulate_presence(params, starts, jax.random.key(9))
    counts_np, _ = simulate_tracks_numpy(
        starts, GRID, 0., 1., 1, nsteps, np.random.default_rng(1234))
    a = np.asarray(smooth_presence(np.asarray(presence), 3), np.float64)
    b = np.asarray(smooth_presence(counts_np.astype(np.int32), 3),
                   np.float64)
    a /= a.sum()
    b /= b.sum()
    l1 = np.abs(a - b).sum()
    assert l1 < 0.08, f'smoothed presence L1 distance {l1}'


def test_fluidflow_presence_matches_numpy_oracle(rng):
    n = 3000
    starts = _starts(n, rng)
    nsteps = 150
    updraft, potential = _updraft_potential()
    params = _params(nsteps=nsteps, move_dirn=0., nu=1., memory_k=1)
    presence, _ = simulate_presence(params, starts, jax.random.key(21),
                                    updraft=updraft, potential=potential)
    counts_np, _ = simulate_tracks_numpy(
        starts, GRID, 0., 1., 1, nsteps, np.random.default_rng(77),
        updraft=updraft, potential=potential)
    a = np.asarray(smooth_presence(np.asarray(presence), 3), np.float64)
    b = np.asarray(smooth_presence(counts_np.astype(np.int32), 3),
                   np.float64)
    a /= a.sum()
    b /= b.sum()
    l1 = np.abs(a - b).sum()
    assert l1 < 0.08, f'smoothed presence L1 distance {l1}'


def test_memory_restriction_reduces_backtracking(rng):
    """With memory masking, immediate reversals (move m then its opposite)
    must be rare in recorded tracks."""
    starts = _starts(128, rng)
    nsteps = 100
    _, _, tracks, lengths = simulate_presence(
        _params(nsteps=nsteps, memory_k=1), starts, jax.random.key(13),
        record_tracks=True)
    tracks = np.asarray(tracks).astype(np.int32)
    lengths = np.asarray(lengths)
    deltas = np.diff(tracks, axis=0)  # (nsteps, N, 2)
    reversals = 0
    moves = 0
    for i in range(tracks.shape[1]):
        live = lengths[i] - 1
        d = deltas[:live, i]
        keep = np.abs(d).max(axis=1) <= 1  # exclude burn-in jumps
        d = d[keep]
        rev = (d[1:] == -d[:-1]).all(axis=1) & (np.abs(d[1:]).sum(axis=1) > 0)
        reversals += rev.sum()
        moves += max(len(d) - 1, 0)
    assert reversals / max(moves, 1) < 0.01


def test_native_trackbuilder_matches_python_loop(rng, monkeypatch):
    """The C++ trajectory builder (ssrs_tpu/native) must reproduce the
    pure-Python list-append reconstruction exactly — same device
    emissions (same key), so the track lists must be identical arrays."""
    import ssrs_tpu.native as native
    from ssrs_tpu.agents import simulate_tracks_recorded

    if not native.native_available():
        pytest.skip('no C++ toolchain available')

    nrow, ncol = 40, 48
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=4, nsteps=150)
    n = 300
    starts = np.stack([rng.integers(3, 6, n), rng.integers(10, 38, n)],
                      axis=1).astype(np.int32)
    y = np.linspace(0, np.pi, nrow)[:, None]
    x = np.linspace(0, 2 * np.pi, ncol)[None, :]
    updraft = (1.0 + 0.8 * np.sin(x) * np.sin(y)).astype(np.float32)
    potential = (np.linspace(1000., 0., nrow)[:, None]
                 * np.ones((1, ncol))).astype(np.float32)

    p_nat, tracks_nat = simulate_tracks_recorded(
        params, starts, jax.random.key(2), updraft=updraft,
        potential=potential, chunk=64, min_bucket=64)
    monkeypatch.setattr(native, 'native_available', lambda: False)
    p_py, tracks_py = simulate_tracks_recorded(
        params, starts, jax.random.key(2), updraft=updraft,
        potential=potential, chunk=64, min_bucket=64)

    np.testing.assert_array_equal(np.asarray(p_nat), np.asarray(p_py))
    assert len(tracks_nat) == len(tracks_py) == n
    for a, b in zip(tracks_nat, tracks_py):
        assert a.dtype == np.int16 and a.shape == b.shape
        np.testing.assert_array_equal(a, b)

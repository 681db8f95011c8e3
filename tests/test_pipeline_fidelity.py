"""Full-pipeline statistical fidelity: synthetic DEM -> slope/aspect ->
orographic updraft -> threshold -> f64 direct potential -> device lockstep
simulation, compared against the sequential NumPy oracle running on the
SAME fields (the acceptance strategy SURVEY.md SS4 prescribes: presence-map
distributions, not per-track RNG parity)."""

import jax
import numpy as np

from ssrs_tpu.agents import TrackParams, simulate_presence
from ssrs_tpu.agents.presence import smooth_presence
from ssrs_tpu.fields import (compute_orographic_updraft,
                             compute_slope_aspect_degrees,
                             get_above_threshold_speed)
from ssrs_tpu.potential import solve_potential_direct

from oracle_agents import simulate_tracks_numpy


def _pipeline_fields(synthetic_dem):
    res = 100.
    slope, aspect = compute_slope_aspect_degrees(synthetic_dem, res)
    w = compute_orographic_updraft(
        10. * np.ones(synthetic_dem.shape, np.float32),
        270. * np.ones(synthetic_dem.shape, np.float32),
        np.asarray(slope, np.float32), np.asarray(aspect, np.float32))
    usable = np.asarray(get_above_threshold_speed(w, 0.75))
    potential = solve_potential_direct(usable, 0.)
    return usable, potential


def test_fluidflow_pipeline_matches_oracle(synthetic_dem, rng):
    usable, potential = _pipeline_fields(synthetic_dem)
    nrow, ncol = usable.shape
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=250)
    n = 2500
    starts = np.stack([rng.integers(3, 8, n),
                       rng.integers(10, ncol - 10, n)],
                      axis=1).astype(np.int32)
    presence, _ = simulate_presence(params, starts, jax.random.key(17),
                                    updraft=usable, potential=potential)
    counts_np, _ = simulate_tracks_numpy(
        starts, (nrow, ncol), 0., 1., 1, 250,
        np.random.default_rng(99), updraft=usable, potential=potential)
    a = np.asarray(smooth_presence(np.asarray(presence), 4), np.float64)
    b = np.asarray(smooth_presence(counts_np.astype(np.int32), 4),
                   np.float64)
    a /= a.sum()
    b /= b.sum()
    l1 = np.abs(a - b).sum()
    assert l1 < 0.10, f'pipeline presence L1 distance {l1}'


def test_pipeline_tracks_follow_updraft_corridors(synthetic_dem, rng):
    """Sanity: with fluidflow, high-usable-updraft cells accumulate more
    presence than zero-updraft cells on average (the model's purpose)."""
    usable, potential = _pipeline_fields(synthetic_dem)
    nrow, ncol = usable.shape
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=250)
    n = 2500
    starts = np.stack([rng.integers(3, 8, n),
                       rng.integers(10, ncol - 10, n)],
                      axis=1).astype(np.int32)
    presence, _ = simulate_presence(params, starts, jax.random.key(21),
                                    updraft=usable, potential=potential)
    presence = np.asarray(presence).astype(np.float64)
    # compare away from start rows and borders
    zone = slice(20, nrow - 5)
    hot = usable[zone, 5:-5] > 1.0
    cold = usable[zone, 5:-5] == 0.0
    p = presence[zone, 5:-5]
    assert hot.sum() > 100 and cold.sum() > 100
    # measured preference is ~1.33x on this terrain; assert a clear gap
    assert p[hot].mean() > 1.2 * p[cold].mean()

"""Agent simulation core: moves, starts, lockstep simulation, presence."""

from .moves import (NEIGHBOR_DELTAS, NEIGHBOR_NORMS_INV, directional_probs,
                    move_probability_cascade, restriction_table,
                    track_restrictions)
from .presence import (compute_presence_counts,
                       compute_smooth_presence_counts, circular_kernel,
                       smooth_presence, smooth_presence_from_counts)
from .simulate import (SimState, TrackParams, harmonic_mean_weights,
                       init_state, make_step_fn, prepare_starts,
                       prepared_weights, prepared_weights_batch,
                       simulate_presence, simulate_presence_cases,
                       simulate_presence_cases_compacting,
                       simulate_presence_compacting,
                       simulate_tracks_recorded)
from .starts import get_starting_indices

__all__ = [
    'NEIGHBOR_DELTAS', 'NEIGHBOR_NORMS_INV', 'directional_probs',
    'move_probability_cascade', 'restriction_table', 'track_restrictions',
    'compute_presence_counts', 'compute_smooth_presence_counts',
    'circular_kernel', 'smooth_presence', 'smooth_presence_from_counts',
    'SimState', 'TrackParams', 'harmonic_mean_weights', 'init_state',
    'make_step_fn', 'prepare_starts', 'prepared_weights',
    'prepared_weights_batch', 'simulate_presence',
    'simulate_presence_cases', 'simulate_presence_cases_compacting',
    'simulate_presence_compacting',
    'simulate_tracks_recorded', 'get_starting_indices',
]

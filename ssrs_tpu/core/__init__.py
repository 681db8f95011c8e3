"""Core primitives: grid geometry, PRNG plumbing, timing."""

from .grid import Grid
from .rng import case_key, fold_str, root_key
from .timing import PhaseTimer, elapsed_str

__all__ = ['Grid', 'case_key', 'fold_str', 'root_key', 'PhaseTimer',
           'elapsed_str']

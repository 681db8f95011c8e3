"""Directional-potential ("fluid flow") solver."""

from .boundary import boundary_masks, boundary_nodes
from .solver import (solve_potential, solve_potential_for_direction,
                     transition_planes)

__all__ = ['boundary_masks', 'boundary_nodes', 'solve_potential',
           'solve_potential_for_direction', 'transition_planes']

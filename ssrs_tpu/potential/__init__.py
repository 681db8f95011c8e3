"""Directional-potential ("fluid flow") solver."""

from .boundary import boundary_masks, boundary_nodes
from .direct import solve_potential_direct
from .lap import (solve_potential_refined,
                  solve_potential_refined_batch, weight_planes)
from .multigrid import solve_potential_mg
from .solver import (solve_potential, solve_potential_for_direction,
                     transition_planes)

__all__ = ['boundary_masks', 'boundary_nodes', 'solve_potential',
           'solve_potential_for_direction', 'transition_planes',
           'solve_potential_direct', 'solve_potential_mg',
           'solve_potential_refined', 'solve_potential_refined_batch',
           'weight_planes']

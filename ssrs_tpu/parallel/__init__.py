"""Device-mesh parallelism."""

from .mesh import make_mesh, pad_to_multiple, simulate_presence_sharded

__all__ = ['make_mesh', 'pad_to_multiple', 'simulate_presence_sharded']

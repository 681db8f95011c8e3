"""Device-mesh parallelism."""

from .mesh import (make_mesh, pad_to_multiple, sharded_presence_fn,
                   simulate_presence_sharded,
                   simulate_presence_sharded_compacting)

__all__ = ['make_mesh', 'pad_to_multiple', 'sharded_presence_fn',
           'simulate_presence_sharded',
           'simulate_presence_sharded_compacting']

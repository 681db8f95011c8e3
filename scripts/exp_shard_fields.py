"""Can GSPMD shard the potential solve spatially with sane collectives?

Row-shard the field arrays over an 8-device virtual CPU mesh, jit the
production refined solve with sharding constraints, then:
1. compare numerics vs the single-device solve,
2. count collectives in the compiled HLO (want: halo collective-permutes
   + small all-reduces; do NOT want: full-field all-gathers),
3. report per-device peak memory if available.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax

jax.config.update('jax_platforms', 'cpu')

import re
from functools import partial

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import ssrs_tpu.potential.lap as L
from ssrs_tpu.parallel.fields import _shard_tiles
from ssrs_tpu.potential.boundary import boundary_masks


def hard_conductivity(shape, seed=1):
    rng = np.random.default_rng(seed)
    nrow, ncol = shape
    y = np.linspace(0, 3 * np.pi, nrow)[:, None]
    x = np.linspace(0, 4 * np.pi, ncol)[None, :]
    w = 1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) + 0.1 * rng.random(shape)
    w[w < 0.6] = 0.0
    return w.astype(np.float32)


def main(shape=(512, 512)):
    mesh = Mesh(np.array(jax.devices()), ('rows',))
    row_sharding = NamedSharding(mesh, P('rows', None))

    cond = hard_conductivity(shape, seed=1)
    bmask_np, bvals = (np.asarray(x) for x in boundary_masks(0., shape))
    labels_np, k = L.island_labels(cond, bmask_np)
    num = 256
    while num < k + 1:
        num *= 4
    tiles = L.build_tile_hierarchy(labels_np, bmask_np)

    args = (jnp.asarray(cond), jnp.asarray(bmask_np),
            jnp.asarray(bvals, jnp.float32))

    # single-device reference
    sound = jnp.asarray(L.island_sound_mask(labels_np, num))
    ref, rrel_ref = L._solve_refined_jit(*args, tiles, sound, num,
                                         1e-7, 60, 30)
    ref = np.asarray(ref)
    print('single-device rrel:', float(rrel_ref))

    # sharded: row-shard the (nrow, ncol) inputs and the tile dicts
    shard = lambda x: jax.device_put(x, row_sharding)
    args_s = tuple(shard(a) for a in args)
    tiles = _shard_tiles(tiles, mesh, shape)

    fn = jax.jit(partial(L._solve_refined_jit.__wrapped__,
                         num_segments=num, tol=1e-7, maxcycles=60,
                         refine=30, field_sharding=row_sharding),
                 static_argnames=())
    lowered = fn.lower(*args_s, tiles, shard(sound))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    colls = {}
    for opname in ('all-gather', 'all-reduce', 'collective-permute',
                   'all-to-all', 'reduce-scatter'):
        n = len(re.findall(rf'{opname}\b', hlo))
        colls[opname] = n
    print('collectives in compiled HLO:', colls)
    # biggest all-gather shapes (the failure mode to watch)
    ags = re.findall(r'(\S+) = \S+ all-gather\(', hlo)
    shapes = re.findall(r'= (\S+?)\[?[0-9,]*\]? all-gather', hlo)
    big = re.findall(r'f32\[([0-9,]+)\]\S* all-gather', hlo)
    if big:
        sizes = sorted((np.prod([int(x) for x in s.split(',')]), s)
                       for s in big)
        print('largest all-gather operands:', sizes[-5:])

    out, rrel = fn(*args_s, tiles)
    out = np.asarray(out)
    print('sharded rrel:', float(rrel),
          'max |sharded - single|:', np.abs(out - ref).max())


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    main((n, n))

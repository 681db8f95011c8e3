"""Spatially-sharded field path (parallel/fields.py): the very-large-grid
story. Validated per SURVEY §4 strategy on the 8-virtual-device CPU mesh:
smoother bit-identity, full-solve tolerance vs the single-device solver,
and an HLO bound on collective sizes (no full-field gathers)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssrs_tpu.parallel.fields import (make_field_mesh,
                                      orographic_updraft_from_dem_sharded,
                                      row_sharding,
                                      solve_potential_refined_sharded)
from ssrs_tpu.potential.boundary import boundary_masks
from ssrs_tpu.potential.lap import (_smooth, build_lap_levels,
                                    build_tile_hierarchy, island_labels,
                                    solve_potential_refined, weight_planes)

from test_potential import _conductivity_hard


# 256 rows = 8 tile rows (lap._TILE=32), one per device: the fine-level
# deflation tile reshape stays shard-local, as it does at production
# scale (8192^2 -> 256 tile rows). Misaligned row counts make GSPMD
# reshard the FINE field into tile rows with partial all-gathers — a
# tiny-grid artifact the HLO bound below would (correctly) reject.
SHAPE = (256, 224)


def _setup(shape=SHAPE, dirn=0., seed=1):
    cond = _conductivity_hard(shape, seed=seed)
    bmask, bvals = boundary_masks(dirn, shape)
    return cond, np.asarray(bmask), np.asarray(bvals)


def test_sharded_smoother_bit_identical():
    """Row-sharded damped Jacobi == single-device, bitwise: the stencil
    is pad-and-slice (halo permutes under GSPMD), every add is local."""
    cond, bmask, bvals = _setup()
    labels, k = island_labels(cond, bmask)
    num = 256
    tiles = build_tile_hierarchy(labels, bmask)
    planes = weight_planes(jnp.asarray(cond))
    levels = build_lap_levels(planes, jnp.asarray(bmask), tiles, num)
    top = levels[0]
    rng = np.random.default_rng(0)
    u = (rng.random(SHAPE) - 0.5).astype(np.float32)
    rhs = (rng.random(SHAPE) - 0.5).astype(np.float32)

    smooth = jax.jit(lambda lv, u, r: _smooth(lv, u, r, 0.85, 3))
    want = np.asarray(smooth(top, jnp.asarray(u), jnp.asarray(rhs)))

    mesh = make_field_mesh()
    sh = row_sharding(mesh)
    top_s = jax.tree.map(
        lambda x: jax.device_put(x, sh)
        if getattr(x, 'ndim', 0) == 2 and x.shape == SHAPE else x, top)
    got = np.asarray(smooth(top_s, jax.device_put(jnp.asarray(u), sh),
                            jax.device_put(jnp.asarray(rhs), sh)))
    np.testing.assert_array_equal(got, want)


def test_sharded_solve_matches_single_device():
    cond, bmask, bvals = _setup()
    want, rrel_1 = solve_potential_refined(cond, bmask, bvals)
    got, rrel_8 = solve_potential_refined_sharded(cond, bmask, bvals)
    assert float(rrel_1) < 1e-5 and float(rrel_8) < 1e-5
    # same equations, different reduction order: agreement far inside the
    # oracle tolerance used in test_potential (1.0 out of 1000)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 0.05


def test_sharded_solve_hlo_collectives_bounded():
    """The partitioned solver must not gather full-field arrays: halo
    collective-permutes and small all-reduces/gathers only (coarse
    levels may replicate — they are O(N/64) cells)."""
    from functools import partial
    from ssrs_tpu.potential.lap import _solve_refined_jit, island_sound_mask
    from ssrs_tpu.parallel.fields import _shard_rows, _shard_tiles
    cond, bmask, bvals = _setup()
    labels, k = island_labels(cond, bmask)
    num = 256
    mesh = make_field_mesh()
    tiles = _shard_tiles(build_tile_hierarchy(labels, bmask), mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    args = (_shard_rows(cond, mesh), _shard_rows(bmask, mesh),
            _shard_rows(bvals, mesh))
    sound = jax.device_put(island_sound_mask(labels, num), rep)
    fn = jax.jit(partial(_solve_refined_jit.__wrapped__, num_segments=num,
                         tol=1e-7, maxcycles=60, refine=30,
                         field_sharding=row_sharding(mesh)))
    hlo = fn.lower(*args, tiles, sound).compile().as_text()
    assert len(re.findall(r'collective-permute\b', hlo)) > 0
    ncells = SHAPE[0] * SHAPE[1]
    for m in re.finditer(r'\w+\[([0-9,]+)\][^=]*? all-gather', hlo):
        n = int(np.prod([int(x) for x in m.group(1).split(',')]))
        assert n < ncells // 2, f'full-field all-gather: {m.group(0)}'


def test_sharded_updraft_matches(synthetic_dem):
    from ssrs_tpu.fields.updraft import orographic_updraft_from_dem
    z = synthetic_dem[:112, :144].astype(np.float32)  # rows % 8 == 0
    want = np.asarray(orographic_updraft_from_dem(
        jnp.asarray(z), 30., jnp.float32(10.), jnp.float32(270.)))
    got = np.asarray(orographic_updraft_from_dem_sharded(
        z, 30., 10., 270.))
    np.testing.assert_array_equal(got, want)

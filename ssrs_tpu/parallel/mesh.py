"""Multi-device scaling: agents sharded over a device mesh.

The reference's entire parallelism surface is a host process pool with one
task per agent (ssrs/simulator.py:347,360-381; inventory in SURVEY.md SS2).
The TPU-native equivalent is pure data parallelism over agents:

- the agent batch is sharded over a 1-D mesh axis ``'agents'``;
- field tables (updraft-derived move weights, potential) are replicated —
  they are at most a few hundred MB at 30 m resolution;
- the only cross-device communication in the whole simulation is ONE
  ``psum`` of the per-device presence histograms at the end, riding ICI;
- per-device RNG streams are derived by folding the mesh axis index into
  the step key, so results are deterministic for a fixed mesh size.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..agents.simulate import TrackParams, simulate_presence


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D mesh over the ``'agents'`` axis. ``n_devices`` <= 0 uses all
    local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=('agents',))


def pad_to_multiple(starts: np.ndarray, multiple: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the agent batch so it divides evenly across devices; padding
    agents are marked invalid (they start dead and contribute nothing)."""
    n = starts.shape[0]
    n_pad = (-n) % multiple
    valid = np.ones(n + n_pad, dtype=bool)
    if n_pad:
        starts = np.concatenate(
            [starts, np.broadcast_to(starts[-1:], (n_pad, 2))], axis=0)
        valid[n:] = False
    return np.ascontiguousarray(starts), valid


def sharded_presence_fn(params: TrackParams, mesh: Mesh,
                        chunk: int = 128, has_updraft: bool = True,
                        has_potential: bool = True):
    """Build the shard-mapped simulation callable over ``mesh``.

    The returned function takes ``(starts, valid, key[, updraft
    [, potential]])`` with the agent axis sharded and fields replicated,
    and returns globally-summed ``(presence, steps)``. Exposed separately
    from :func:`simulate_presence_sharded` so callers (weak-scaling
    evidence in ``scripts/weak_scaling.py``, tests) can ``jax.jit(...)
    .lower(...)`` it and assert the collective schedule — one presence
    ``psum`` + one step-count ``pmax`` and nothing else.
    """

    if has_potential and not has_updraft:
        raise ValueError('potential requires updraft (the fluidflow '
                         'weight table is built from both)')

    def shard_body(starts_l, valid_l, key_r, *fields):
        updraft_r = fields[0] if has_updraft else None
        potential_r = fields[int(has_updraft)] if has_potential else None
        # distinct per-device stream, deterministic for a fixed mesh size
        key_l = jax.random.fold_in(key_r, jax.lax.axis_index('agents'))
        presence, steps = simulate_presence(
            params, starts_l, key_l, updraft=updraft_r,
            potential=potential_r, chunk=chunk, valid=valid_l)
        return (jax.lax.psum(presence, 'agents'),
                jax.lax.pmax(steps, 'agents'))

    in_specs = [P('agents'), P('agents'), P()]
    in_specs += [P(None, None)] * (int(has_updraft) + int(has_potential))
    return jax.shard_map(shard_body, mesh=mesh, in_specs=tuple(in_specs),
                         out_specs=(P(), P()))


def simulate_presence_sharded(params: TrackParams,
                              start_rc: np.ndarray,
                              key: jax.Array,
                              updraft: Optional[jax.Array] = None,
                              potential: Optional[jax.Array] = None,
                              mesh: Optional[Mesh] = None,
                              chunk: int = 128):
    """Run the lockstep simulation with agents sharded over the mesh.

    Returns (presence int32 (nrow, ncol) — globally summed, steps int32).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    starts, valid = pad_to_multiple(np.asarray(start_rc, np.int32), n_dev)

    if potential is not None and updraft is None:
        raise ValueError('potential requires updraft (the fluidflow '
                         'weight table is built from both)')
    mapped = sharded_presence_fn(params, mesh, chunk,
                                 has_updraft=updraft is not None,
                                 has_potential=potential is not None)
    args = [jnp.asarray(starts), jnp.asarray(valid), key]
    if updraft is not None:
        args.append(jnp.asarray(updraft))
    if potential is not None:
        args.append(jnp.asarray(potential))
    return mapped(*args)

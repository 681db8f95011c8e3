"""Pod-readiness smoke: the one script to run on first real multi-chip
access (VERDICT r3 item 6).

Real ICI has never been available to this repo (one tunneled v5e chip);
every sharded path is correctness-proven on the virtual CPU mesh and
HLO-bounded, but never timed on hardware. When a pod slice appears, run

    python scripts/pod_smoke.py            # on the pod
    python scripts/pod_smoke.py --rehearse # anywhere (virtual 8-dev CPU)

It executes, in order, asserting correctness everywhere and perf only
on real TPU:

1. sharded headline bench: the compacting sharded driver
   (per-shard survivor packing + one-dispatch tail) on the 500x600
   benchmark workload with 100k tracks PER DEVICE (weak scaling);
2. scaling sweep at 1, 2, 4, ..., n devices: per-chip agent-step
   throughput must stay within EXPECTED['weak_efficiency'] of the
   1-device rate (the only ICI traffic is one 1.2 MB all-reduce and a
   scalar pmax per chunk round — docs/DESIGN.md);
3. the row-sharded refined potential solve at the largest grid one
   chip can hold (8192^2), expected to speed up and/or free memory
   headroom across chips.

Expected ranges below come from the round-3/4 single-chip
measurements with the documented 2-3x device-window variance already
folded in: a FAILURE here means the pod path is broken or ICI is the
bottleneck, not that the chip had a slow hour.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

EXPECTED = {
    # per-chip agent-steps/s for the sharded compacting driver on the
    # 500x600 workload. Single-chip compacting measured ~176M in a good
    # window, ~61M in the worst recorded window; sharding adds one
    # scalar pmax per round. Anything below the floor is a real
    # regression, not window noise.
    'per_chip_steps_per_sec_min': 30e6,
    # weak-scaling efficiency: per-chip rate at n devices vs 1 device.
    # The collective load is ~1 KB/round + 1.2 MB once; v5e ICI moves
    # that in < 1 ms, so < 0.6 means something structural (resharding,
    # host serialization) crept in.
    'weak_efficiency_min': 0.6,
    # warm row-sharded 8192^2 refined solve, seconds. One chip measures
    # 60-90 s warm in its windows; row sharding splits the bandwidth-
    # bound V-cycle sweeps, so n chips should land well under the
    # single-chip ceiling.
    'solve_8192_max_seconds': 120.0,
}


def _provision(rehearse: bool, n: int):
    if rehearse:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        flags = os.environ.get('XLA_FLAGS', '')
        if 'xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                flags +
                f' --xla_force_host_platform_device_count={n}').strip()
    import jax
    if rehearse:
        jax.config.update('jax_platforms', 'cpu')
    return jax


def bench_sharded(jax, n_dev, rehearse, chunk=512):
    import numpy as np
    from bench import synthetic_dem
    from ssrs_tpu.agents import TrackParams, get_starting_indices
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.parallel import (make_mesh,
                                   simulate_presence_sharded_compacting)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    import jax.numpy as jnp

    if rehearse:
        nrow, ncol, res = 120, 144, 100.0
        tracks_per_dev, cap = 2048, 512
    else:
        nrow, ncol, res = 500, 600, 100.0
        tracks_per_dev, cap = 100_000, 10_000
    n_tracks = tracks_per_dev * n_dev
    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
    w = orographic_updraft_from_dem(
        dem, res, 10. * jnp.ones((nrow, ncol), jnp.float32),
        270. * jnp.ones((nrow, ncol), jnp.float32))
    cond = get_above_threshold_speed(w, 0.75)
    bmask, bvals = boundary_masks(0., (nrow, ncol))
    pot, _ = solve_potential_refined(np.asarray(cond), bmask, bvals)
    pot = jnp.asarray(np.asarray(pot))

    rows, cols = get_starting_indices(
        n_tracks, [2., ncol * res / 1000. - 2., 1., 2.], 'random',
        (ncol * res / 1000., nrow * res / 1000.), res,
        rng=np.random.default_rng(42))
    starts = np.stack([rows, cols], axis=1).astype(np.int32)
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=cap, weight_dtype='bfloat16')
    mesh = make_mesh(n_dev)

    def run(seed):
        presence, steps = simulate_presence_sharded_compacting(
            params, starts, jax.random.key(seed), updraft=cond,
            potential=pot, mesh=mesh, chunk=chunk)
        return np.asarray(presence)

    run(0)  # compile + warm
    t0 = time.perf_counter()
    p = run(1)
    dt = time.perf_counter() - t0
    total = int(p.astype(np.int64).sum())
    assert total >= n_tracks, 'presence lost starts'
    steps_per_sec = (total - n_tracks) / dt
    return {'n_dev': n_dev, 'tracks': n_tracks,
            'agent_steps': total - n_tracks,
            'seconds': round(dt, 3),
            'per_chip_steps_per_sec': round(steps_per_sec / n_dev, 1)}


def bench_cases_spread(jax, n_dev, rehearse, chunk=512):
    """C = n_dev cases, one per device, through the interleaved
    multi-case compacting driver with devices= (zero collectives)."""
    import numpy as np
    from bench import synthetic_dem
    from ssrs_tpu.agents import (TrackParams, directional_probs,
                                 get_starting_indices, prepared_weights,
                                 simulate_presence_cases_compacting)
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    from ssrs_tpu.potential import solve_potential_refined
    from ssrs_tpu.potential.boundary import boundary_masks
    import jax.numpy as jnp

    if rehearse:
        nrow, ncol, res = 120, 144, 100.0
        n_tracks, cap = 2048, 512
    else:
        nrow, ncol, res = 500, 600, 100.0
        n_tracks, cap = 100_000, 10_000
    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))
    dirp = jnp.asarray(directional_probs(0.))
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=cap, weight_dtype='bfloat16')
    rng = np.random.default_rng(1)
    tables = []
    for i in range(n_dev):
        dirn = float(rng.uniform(180., 360.))
        w = orographic_updraft_from_dem(
            dem, res, 10. * jnp.ones((nrow, ncol), jnp.float32),
            dirn * jnp.ones((nrow, ncol), jnp.float32))
        cond = get_above_threshold_speed(w, 0.75)
        bmask, bvals = boundary_masks(0., (nrow, ncol))
        pot, _ = solve_potential_refined(np.asarray(cond), bmask, bvals)
        tables.append(prepared_weights(cond, jnp.asarray(np.asarray(pot)),
                                       dirp, 'bfloat16'))
    rows, cols = get_starting_indices(
        n_tracks, [2., ncol * res / 1000. - 2., 1., 2.], 'random',
        (ncol * res / 1000., nrow * res / 1000.), res,
        rng=np.random.default_rng(3))
    starts = np.stack([rows, cols], axis=1).astype(np.int32)
    devices = jax.devices()[:n_dev]

    def run(seed):
        keys = list(jax.random.split(jax.random.key(seed), n_dev))
        p, s = simulate_presence_cases_compacting(
            params, tables, starts, keys, chunk=chunk, devices=devices)
        return np.asarray(p)

    run(0)
    t0 = time.perf_counter()
    p = run(1)
    dt = time.perf_counter() - t0
    total = int(p.astype(np.int64).sum())
    steps = total - n_dev * n_tracks
    return {'cases': n_dev, 'n_dev': n_dev, 'seconds': round(dt, 3),
            'agent_steps': steps,
            'per_chip_steps_per_sec': round(steps / dt / n_dev, 1)}


def solve_sharded(jax, n_dev, rehearse):
    import numpy as np
    from ssrs_tpu.parallel.fields import (make_field_mesh,
                                          solve_potential_refined_sharded)
    from ssrs_tpu.potential.boundary import boundary_masks

    n = 256 if rehearse else 8192
    shape = (n, n)
    y = np.linspace(0, 3 * np.pi, n)[:, None]
    x = np.linspace(0, 4 * np.pi, n)[None, :]
    cond = np.clip(1.5 * np.abs(np.sin(x) * np.cos(0.8 * y)) - 0.45,
                   0., None).astype(np.float32)
    bmask, bvals = boundary_masks(0., shape)
    mesh = make_field_mesh(n_dev)
    solve = lambda: solve_potential_refined_sharded(
        cond, np.asarray(bmask), np.asarray(bvals), mesh=mesh)
    pot, rrel = solve()
    np.asarray(pot)  # compile + first solve
    t0 = time.perf_counter()
    pot, rrel = solve()
    pot = np.asarray(pot)
    dt = time.perf_counter() - t0
    assert np.isfinite(pot).all()
    return {'grid': n, 'n_dev': n_dev, 'warm_seconds': round(dt, 2),
            'rrel': float(rrel)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rehearse', action='store_true',
                    help='virtual 8-device CPU mesh, tiny sizes, no '
                         'perf assertions')
    ap.add_argument('--devices', type=int, default=0,
                    help='limit device count (0 = all)')
    args = ap.parse_args()
    jax = _provision(args.rehearse, args.devices or 8)
    devices = jax.devices()
    n_max = args.devices or len(devices)
    on_tpu = devices[0].platform == 'tpu'
    print(f'# pod_smoke: {len(devices)} x {devices[0].platform} '
          f'(using {n_max}); rehearse={args.rehearse}', flush=True)

    report = {'platform': devices[0].platform, 'n_devices': n_max,
              'rehearse': args.rehearse, 'expected': EXPECTED}

    # 1+2: sharded bench + scaling sweep
    sweep = []
    n = 1
    while n <= n_max:
        r = bench_sharded(jax, n, args.rehearse)
        sweep.append(r)
        print(f'#   bench n_dev={n}: {r}', flush=True)
        n *= 2
    report['bench_sweep'] = sweep
    if on_tpu and not args.rehearse:
        base = sweep[0]['per_chip_steps_per_sec']
        for r in sweep:
            assert (r['per_chip_steps_per_sec']
                    >= EXPECTED['per_chip_steps_per_sec_min']), r
            eff = r['per_chip_steps_per_sec'] / base
            assert eff >= EXPECTED['weak_efficiency_min'], (r, eff)
        report['weak_efficiency'] = round(
            sweep[-1]['per_chip_steps_per_sec'] / base, 3)

    # 3: case parallelism — C cases spread over the devices (zero
    # collectives; the seasonal production pattern on a pod)
    r = bench_cases_spread(jax, n_max, args.rehearse)
    print(f'#   case-spread: {r}', flush=True)
    report['case_spread'] = r
    if on_tpu and not args.rehearse:
        assert (r['per_chip_steps_per_sec']
                >= EXPECTED['per_chip_steps_per_sec_min']), r

    # 4: row-sharded large solve
    r = solve_sharded(jax, n_max, args.rehearse)
    print(f'#   solve: {r}', flush=True)
    report['solve'] = r
    if on_tpu and not args.rehearse:
        assert r['warm_seconds'] <= EXPECTED['solve_8192_max_seconds'], r

    print(json.dumps(report))
    return 0


if __name__ == '__main__':
    sys.exit(main())

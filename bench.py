"""Headline benchmark, run on real TPU hardware by the driver.

Workload mirrors the reference's main documented benchmark (BASELINE.md):
WY-scale 500x600 grid @100 m, uniform wind, fluidflow movement model —
scaled up to the north-star 100k tracks. The reference simulates 500-1000
tracks on an 8-core laptop pool at roughly 4e4 agent-steps/s total
(500 tracks x ~700 steps in 9 s, workshop/ssrs_demo.ipynb:445); that number
is the ``vs_baseline`` denominator.

Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Un-losable capture discipline (VERDICT r4 item 1 — the round-4 driver
run timed out on a cold compile cache with zero output):

- All progress goes to **stderr**, flushed, with elapsed timestamps, so
  a timeout leaves evidence of exactly where the run died. stdout
  carries exactly one JSON line in every exit path.
- A **best-so-far result** is updated as each phase completes; it is
  emitted (a) at the happy-path end, (b) when the deadline approaches
  (checked between phases and between clock stages), or (c) from a
  SIGTERM/SIGALRM handler if an external ``timeout`` fires first. The
  first warm track-sim run already banks a usable headline number.
- The clock is staged (1 + 2 + 3 back-to-back warm runs): each stage
  syncs once and folds into the cumulative rate, so even a partial
  capture is a real multi-run measurement. Per-run syncs are NOT used —
  the ~50 ms axon-tunnel scalar read per run was measured at ~10% of a
  0.6 s run (the round-3 summed-clock rationale, kept).
- The potential solve falls back to a flat field (detail-flagged) if
  the refined solver fails or the budget is nearly gone: the headline
  is the track engine, and it must not die for an optional field.
- Deadline: ``SSRS_BENCH_DEADLINE`` seconds (default 540); a SIGALRM
  is armed 10 s before it as the in-process backstop.
"""

import json
import os
import signal
import sys
import time

import numpy as np

REFERENCE_AGENT_STEPS_PER_SEC = 4.0e4  # derivation above

T0 = time.perf_counter()
DEADLINE = float(os.environ.get('SSRS_BENCH_DEADLINE', 540.))
_EMITTED = False
BEST = None  # best-so-far result dict, updated as phases complete
# measurements from completed PRE-clock phases (updraft throughput,
# potential solve): merged into the emitted detail even when the run
# dies before any clock stage banks a headline number, so a timeout
# during the track-engine compile still leaves every number measured
# so far in the JSON of record
PARTIAL = {}


def elapsed():
    return time.perf_counter() - T0


def remaining():
    return DEADLINE - elapsed()


def progress(msg):
    print(f'[bench +{elapsed():7.1f}s] {msg}', file=sys.stderr, flush=True)


def emit_and_exit(code=0):
    """Print the single stdout JSON line (best-so-far) and exit NOW.

    os._exit avoids hanging in backend teardown if a device call was
    interrupted mid-flight.
    """
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        out = BEST if BEST is not None else {
            'metric': 'agent_steps_per_sec_per_chip', 'value': None,
            'unit': 'agent-steps/s', 'vs_baseline': None,
            'detail': {'error': 'no timed run completed',
                       'elapsed_s': round(elapsed(), 1), **PARTIAL},
        }
        print(json.dumps(out), flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


def _on_signal(signum, frame):
    progress(f'signal {signum} received — emitting best-so-far result')
    emit_and_exit(0)


def synthetic_dem(nrow, ncol, res):
    """Deterministic ridge-and-valley terrain, WY-like relief (~1 km)."""
    y = np.linspace(0, 1, nrow)[:, None]
    x = np.linspace(0, 1, ncol)[None, :]
    z = (500 * np.sin(2 * np.pi * 3.5 * x) * np.cos(2 * np.pi * 2.5 * y)
         + 300 * np.sin(2 * np.pi * 7 * x + 1.3)
         + 200 * np.cos(2 * np.pi * 5 * y + 0.4)
         + 2000)
    return z.astype(np.float32)


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    signal.alarm(max(5, int(DEADLINE - elapsed()) - 10))

    global BEST
    progress(f'start (deadline {DEADLINE:.0f}s)')
    import jax
    import jax.numpy as jnp
    from ssrs_tpu.simulator import _enable_compile_cache
    _enable_compile_cache()
    from ssrs_tpu.agents import TrackParams, get_starting_indices, \
        prepare_starts, simulate_presence_compacting
    from ssrs_tpu.fields import (get_above_threshold_speed,
                                 orographic_updraft_from_dem)
    progress(f'imports done, device={jax.devices()[0]}')

    nrow, ncol, res = 500, 600, 100.0
    n_tracks = 100_000
    step_cap = 10_000

    dem = jnp.asarray(synthetic_dem(nrow, ncol, res))

    # --- updraft field throughput (8 wind directions, like seasonal) ---
    speeds = 10. * jnp.ones((nrow, ncol), jnp.float32)

    @jax.jit
    def updraft_for_dirn(dirn):
        w = orographic_updraft_from_dem(dem, res, speeds,
                                        dirn * jnp.ones_like(speeds))
        return get_above_threshold_speed(w, 0.75)

    dirns_j = jnp.arange(8, dtype=jnp.float32) * 45.

    def updraft_sweeps(k):
        # k chained sweeps in ONE dispatch (the seasonal production
        # pattern is one dispatch per sweep): fori_loop iterations are
        # sequential and the per-iteration direction offset defeats
        # CSE, so (t_k - t_1)/(k-1) is the marginal device cost of one
        # sweep with the tunnel RTT + sync overhead cancelled — the
        # one-dispatch wall is ~150 ms of RTT around ~1 ms of compute,
        # which buried the device number it used to report
        @jax.jit
        def run(ds):
            def body(i, acc):
                return acc + jnp.sum(jax.vmap(updraft_for_dirn)(
                    ds + 1e-3 * i + 0. * acc))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.))
        return run

    # one sweep is ~0.3 ms of device work behind ~25 ms of tunnel
    # RTT/sync, so the iteration gap must be large (128 extra sweeps)
    # and each wall a min-of-3 for the subtraction to carry signal
    K_MANY = 129
    sweep1, sweep_many = updraft_sweeps(1), updraft_sweeps(K_MANY)
    progress('compiling updraft sweep')
    np.asarray(sweep1(dirns_j))  # compile
    np.asarray(sweep_many(dirns_j))

    def timed(fn):
        # np.asarray of a scalar depending on ALL outputs is the sync
        # barrier: block_until_ready does not reliably sync on axon
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(dirns_j))
            best = min(best, time.perf_counter() - t0)
        return best

    dt1 = timed(sweep1)
    dt_many = timed(sweep_many)
    marginal = (dt_many - dt1) / (K_MANY - 1)
    if marginal > 2e-5:   # gap must clear tunnel jitter to be a signal
        dt_updraft = marginal
        note = f'marginal {dt_updraft * 1e3:.2f}ms'
    else:
        # jitter swamped the subtraction this window — report the
        # conservative RTT-bound one-dispatch wall rather than banking
        # a nonsense rate into the capture record
        dt_updraft = dt1
        note = (f'marginal not resolvable ({marginal * 1e3:.2f}ms), '
                'using 1-dispatch wall')
    gridpoints_per_sec = 8 * nrow * ncol / dt_updraft
    PARTIAL['updraft_gridpoints_per_sec'] = round(gridpoints_per_sec, 1)
    progress(f'updraft sweep warm: {note} '
             f'(1-dispatch wall {dt1:.3f}s; '
             f'{gridpoints_per_sec:.3g} gridpoints/s)')

    conductivity = updraft_for_dirn(270.)

    # --- directional potential: the production 'auto' path (refined
    # device solver incl. its per-solve host prep). Optional for the
    # headline — falls back to a flat field if it fails or the budget
    # is nearly gone (the track engine is the capture that counts).
    dt_potential = None
    pot = None
    if remaining() > 90.:
        try:
            progress('compiling+running refined potential solve')
            from ssrs_tpu.potential import solve_potential_refined
            from ssrs_tpu.potential.boundary import boundary_masks
            bmask, bvals = boundary_masks(0., (nrow, ncol))
            cond_np = np.asarray(conductivity)
            p, _ = solve_potential_refined(cond_np, bmask, bvals)
            np.asarray(p)  # compile+run
            t0 = time.perf_counter()
            p, _ = solve_potential_refined(cond_np, bmask, bvals)
            p = np.asarray(p)
            dt_potential = time.perf_counter() - t0
            pot = jnp.asarray(p)
            PARTIAL['potential_solve_seconds'] = round(dt_potential, 3)
            progress(f'potential warm solve: {dt_potential:.3f}s')
        except Exception as exc:  # noqa: BLE001 — flat-field fallback
            progress(f'potential solve FAILED ({exc!r}) — flat fallback')
    else:
        progress('skipping potential solve (budget) — flat fallback')
    if pot is None:
        pot = jnp.zeros((nrow, ncol), jnp.float32)

    # --- track simulation: the headline metric ---
    rows, cols = get_starting_indices(
        n_tracks, [5., 55., 1., 2.], 'random', (ncol * res / 1000.,
                                                nrow * res / 1000.),
        res, rng=np.random.default_rng(42))
    starts = np.stack([rows, cols], axis=1).astype(np.int32)
    # bf16 weight table: the bench is a throughput surface, so it opts
    # into the ~0.4%-quantized table (the Simulator default is 'auto',
    # which picks f32 only when it fits the gather's VMEM budget)
    params = TrackParams(grid_shape=(nrow, ncol), move_dirn=0., nu=1.,
                         memory_k=1, burnin=int(min(nrow, ncol) / 10),
                         nsteps=step_cap, weight_dtype='bfloat16')

    # pad + upload the shared start batch once (the production
    # multi-case pattern; per-run re-upload is ~800 KB of tunnel)
    starts_dev, valid_dev = prepare_starts(params, starts)

    def run(key):
        # tail_bucket='auto': self-tuned tail switch (throughput mode;
        # measured +38% through the tunnel). The bench is a throughput
        # measurement, not a reproducibility surface — the Simulator
        # keeps the deterministic default.
        presence, steps = simulate_presence_compacting(
            params, starts_dev, key, updraft=conductivity, potential=pot,
            chunk=int(os.environ.get('SSRS_BENCH_CHUNK', 512)),
            valid=valid_dev, tail_bucket='auto')
        return presence, steps

    if remaining() < 20.:
        # no headline is reachable from here (the engine compile alone
        # exceeds the budget) — emit what the pre-clock phases measured
        progress('deadline too close for the engine compile — emitting '
                 'partial result')
        emit_and_exit(0)
    progress('compiling track engine (cold run: one executable per '
             'visited bucket rung + tail — the big compile surface)')
    presence, steps = run(jax.random.key(0))
    np.asarray(presence)  # compile + first run (host-synced driver)
    progress('cold run done; warming auto tail-switch estimate')
    # second warm run: the cold run's chunk walls include compiles, so
    # the driver's auto tail-switch only has an honest per-slot cost
    # estimate (and its tail executable) from here on
    np.asarray(run(jax.random.key(0))[0])
    progress('warm-up run done; starting staged clock')

    # Staged clock over warm back-to-back runs (~3.5 s of device work
    # total): a single <1 s run is sensitive to the ~50 ms/dispatch
    # tunnel RTT jitter (+-10% run to run, VERDICT r2); the summed
    # workload is not. Stages of 1+2+3 runs bank a usable cumulative
    # number after each sync so a timeout mid-clock still captures.
    #
    # Within a stage, per-run reductions stay ON DEVICE; one
    # materialization per stage is the clock's sync point. Pulling each
    # run's (nrow, ncol) presence through the tunnel (1.2 MB + an extra
    # scalar read, ~0.1 s per run) was benchmarking the tunnel, not the
    # chip. np.asarray is the reliable sync on axon (block_until_ready
    # is not — see CLAUDE.md). Per-run sums stay int32 device scalars
    # (a single run is ~1e8, safely inside int32; a cross-run int32
    # accumulator would wrap at ~24 bench-sized runs with no error);
    # the stage's sync point is its LAST run's sum — the device
    # executes in order, so materializing it implies every earlier run
    # completed. The tiny per-run totals are then pulled after each
    # stage's clock and summed as Python ints (unbounded).
    accumulate = jax.jit(lambda smax, presence, s:
                         (jnp.sum(presence), jnp.maximum(smax, s)))
    steps_dev = jnp.zeros((), jnp.int32)
    accumulate(steps_dev, presence, steps)  # compile

    def update_best(total_presence, runs_done, dt_total, steps_taken):
        global BEST
        steps_per_sec = (total_presence - runs_done * n_tracks) / dt_total
        BEST = {
            'metric': 'agent_steps_per_sec_per_chip',
            'value': round(steps_per_sec, 1),
            'unit': 'agent-steps/s',
            'vs_baseline': round(
                steps_per_sec / REFERENCE_AGENT_STEPS_PER_SEC, 2),
            'detail': {
                'grid': [nrow, ncol],
                'tracks': n_tracks,
                'agent_steps': (total_presence - runs_done * n_tracks)
                // runs_done,
                'timed_runs': runs_done,
                'sim_seconds': round(dt_total / runs_done, 3),
                'scan_steps_taken': steps_taken,
                'updraft_gridpoints_per_sec': round(gridpoints_per_sec, 1),
                'potential_solve_seconds': (
                    round(dt_potential, 3) if dt_potential is not None
                    else 'flat-fallback'),
                'device': str(jax.devices()[0]),
            },
        }
        progress(f'clock update: {runs_done} runs, '
                 f'{steps_per_sec:.3g} agent-steps/s')

    total_presence = 0
    runs_done = 0
    dt_total = 0.
    run_idx = 0
    for stage_runs in (1, 2, 3):
        if runs_done and remaining() < 30.:
            progress('deadline near — stopping clock early')
            break
        run_sums = []
        t0 = time.perf_counter()
        for _ in range(stage_runs):
            run_idx += 1
            presence, s = run(jax.random.key(run_idx))
            tot_i, steps_dev = accumulate(steps_dev, presence, s)
            run_sums.append(tot_i)
        last = int(np.asarray(run_sums[-1]))  # stage sync point
        dt_total += time.perf_counter() - t0
        total_presence += sum(int(np.asarray(t))
                              for t in run_sums[:-1]) + last
        runs_done += stage_runs
        update_best(total_presence, runs_done, dt_total,
                    int(np.asarray(steps_dev)))

    emit_and_exit(0)


if __name__ == '__main__':
    try:
        main()
    except Exception as exc:  # axon tunnel/compile flakes are transient
        progress(f'attempt 1 failed ({exc!r})')
        if BEST is not None or remaining() < 90.:
            # a banked result (or an empty budget) beats a fresh gamble
            emit_and_exit(0 if BEST is not None else 1)
        progress('retrying once (budget allows)')
        time.sleep(5)
        try:
            main()
        except Exception as exc2:  # noqa: BLE001
            progress(f'attempt 2 failed ({exc2!r})')
            emit_and_exit(0 if BEST is not None else 1)

"""Independent NumPy implementation of the reference track process
(ssrs/movmodel.py:264-318) for statistical validation of the device engine.

Uses the device engine's *tables* (restriction table, directional prior) but
its own sequential control flow and NumPy RNG, so the lockstep scan's
masking/fallback logic is cross-checked against a straightforward
per-agent loop.
"""

from __future__ import annotations

import numpy as np

from ssrs_tpu.agents import (NEIGHBOR_DELTAS, NEIGHBOR_NORMS_INV,
                             directional_probs, restriction_table)


def simulate_tracks_numpy(starts, grid_shape, move_dirn, nu, memory_k,
                          nsteps, rng, updraft=None, potential=None):
    """Sequential per-agent simulation; returns (presence_counts, tracks)."""
    nrow, ncol = grid_shape
    burnin = int(min(nrow, ncol) / 10)
    table = restriction_table()
    dirp = directional_probs(move_dirn).astype(np.float64)
    counts = np.zeros(grid_shape, dtype=np.int64)
    tracks = []
    if updraft is not None:
        w = np.clip(np.asarray(updraft, np.float64), 1e-6, None)
    pot = None if potential is None else np.asarray(potential, np.float64)

    for (r0, c0) in starts:
        r, c = int(r0), int(c0)
        traj = [(r, c)]
        history = [4]
        counts[r, c] += 1
        for k in range(nsteps):
            if k > burnin:
                if not (0 < r < nrow - 1 and 0 < c < ncol - 1):
                    break
            else:
                if r <= 1:
                    r += 2
                elif r >= nrow - 2:
                    r -= 2
                if c <= 0:
                    c += 2
                elif c >= ncol - 2:
                    c -= 2
            if updraft is not None:
                base = np.empty(9)
                for m in range(9):
                    dr, dc = NEIGHBOR_DELTAS[m]
                    wn = w[r + dr, c + dc]
                    hm = 2.0 / (1.0 / w[r, c] + 1.0 / wn)
                    if pot is not None:
                        hm *= (pot[r, c] - pot[r + dr, c + dc]) \
                            * NEIGHBOR_NORMS_INV[m]
                    elif m == 4:
                        hm = 0.
                    base[m] = hm
            else:
                base = dirp.copy()
            mask = np.ones(9)
            mask[4] = 0.
            for m_prev in history[-memory_k:] if memory_k > 0 else []:
                mask *= table[m_prev]
            # cascade (ssrs/movmodel.py:220-244)
            p = dirp.copy() if np.isnan(base).any() else base.clip(min=0.)
            p[4] = 0.
            p = p * mask
            if p.sum() == 0:
                p = dirp.copy()
                p[4] = 0.
                p = p * mask
            if p.sum() == 0:
                p = dirp.copy()
            p = p ** nu
            p = p / p.sum()
            mi = rng.choice(9, p=p)
            dr, dc = NEIGHBOR_DELTAS[mi]
            r, c = r + int(dr), c + int(dc)
            traj.append((r, c))
            history.append(int(mi))
            counts[r, c] += 1
        tracks.append(np.array(traj, dtype=np.int16))
    return counts, tracks

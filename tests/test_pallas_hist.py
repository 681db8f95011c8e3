"""Pallas presence-histogram kernel tests (interpret mode on CPU)."""

import jax
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run the kernel in the Pallas interpreter off-TPU."""
    if jax.default_backend() != 'tpu':
        from jax.experimental import pallas as pl
        real_call = pl.pallas_call

        def interp_call(*args, **kwargs):
            kwargs.setdefault('interpret', True)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(pl, 'pallas_call', interp_call)
    yield


def test_histogram_matches_numpy(rng):
    from ssrs_tpu.agents.pallas_hist import presence_histogram
    n, nrow, ncol = 5000, 96, 130
    r = rng.integers(0, nrow, n).astype(np.int32)
    c = rng.integers(0, ncol, n).astype(np.int32)
    w = rng.integers(0, 2, n).astype(np.float32)
    out = np.asarray(presence_histogram(
        jax.numpy.asarray(r), jax.numpy.asarray(c),
        jax.numpy.asarray(w), nrow, ncol, tile=1024))
    want = np.zeros((nrow, ncol), np.int64)
    np.add.at(want, (r, c), w.astype(np.int64))
    np.testing.assert_array_equal(out, want)


def test_histogram_padding_agents_ignored(rng):
    from ssrs_tpu.agents.pallas_hist import presence_histogram
    # n not a multiple of the tile: padding agents must contribute 0
    n, nrow, ncol = 700, 40, 50
    r = rng.integers(0, nrow, n).astype(np.int32)
    c = rng.integers(0, ncol, n).astype(np.int32)
    w = np.ones(n, np.float32)
    out = np.asarray(presence_histogram(
        jax.numpy.asarray(r), jax.numpy.asarray(c),
        jax.numpy.asarray(w), nrow, ncol, tile=512))
    assert out.sum() == n


def test_histogram_batch_matches_numpy(rng):
    """Weightless batched kernel: int16 inputs, dead points as row -1."""
    from ssrs_tpu.agents.pallas_hist import presence_histogram_batch
    n, nrow, ncol = 6000, 96, 130
    r = rng.integers(0, nrow, n).astype(np.int16)
    c = rng.integers(0, ncol, n).astype(np.int16)
    dead = rng.random(n) < 0.3
    r[dead] = -1
    out = np.asarray(presence_histogram_batch(
        jax.numpy.asarray(r), jax.numpy.asarray(c), nrow, ncol,
        tile=1024))
    want = np.zeros((nrow, ncol), np.int64)
    np.add.at(want, (r[~dead].astype(int), c[~dead].astype(int)), 1)
    np.testing.assert_array_equal(out, want)

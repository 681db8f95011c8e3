"""Unit tests for the move tables and the probability cascade."""

import numpy as np
import jax.numpy as jnp

from ssrs_tpu.agents import (NEIGHBOR_DELTAS, NEIGHBOR_NORMS_INV,
                             directional_probs, move_probability_cascade,
                             restriction_table, track_restrictions)

from oracles import directional_probs_oracle


def test_neighbor_deltas_layout():
    # row-major 3x3, center at 4
    assert NEIGHBOR_DELTAS.shape == (9, 2)
    assert (NEIGHBOR_DELTAS[4] == [0, 0]).all()
    assert (NEIGHBOR_DELTAS[0] == [-1, -1]).all()
    assert (NEIGHBOR_DELTAS[8] == [1, 1]).all()
    np.testing.assert_allclose(NEIGHBOR_NORMS_INV[4], 0.)
    np.testing.assert_allclose(NEIGHBOR_NORMS_INV[0], 1 / np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(NEIGHBOR_NORMS_INV[1], 1., rtol=1e-6)


def test_restriction_table_semantics():
    table = restriction_table()
    assert table.shape == (9, 9)
    # no previous move (center): everything but the center allowed
    assert table[4].sum() == 8 and table[4][4] == 0
    # all rows forbid staying put
    assert (table[:, 4] == 0).all()
    # pure-east previous move (dr=0, dc=1): only column dc=+1 allowed
    east = table[5].reshape(3, 3)
    assert (east[:, 2] == 1).all() and east[:, :2].sum() == 0
    # pure-north previous move (dr=1, dc=0): only row dr=+1 allowed
    north = table[7].reshape(3, 3)
    assert (north[2, :] == 1).all() and north[:2, :].sum() == 0
    # diagonal NE (dr=1, dc=1): rows {0,+1} x cols {0,+1} quadrant
    ne = table[8].reshape(3, 3)
    want = np.zeros((3, 3))
    want[1:, 1:] = 1
    want[1, 1] = 0
    assert (ne == want).all()


def test_restriction_table_matches_function():
    table = restriction_table()
    for m in range(9):
        dr, dc = m // 3 - 1, m % 3 - 1
        np.testing.assert_array_equal(table[m], track_restrictions(dr, dc))


def test_directional_probs_matches_oracle():
    for dirn in [0., 45., 90., 135., 180., 225., 270., 315., 22.5, 333.]:
        got = directional_probs(dirn)
        want = directional_probs_oracle(dirn)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f'direction {dirn}')


def test_directional_probs_prefers_heading():
    # direction 0 = north = +row; the strongest prob must be (dr=+1, dc=0)
    p = directional_probs(0.)
    assert p.argmax() == 7
    p = directional_probs(90.)  # east = +col
    assert p.argmax() == 5
    p = directional_probs(225.)  # southwest
    assert p.argmax() == 0


def _cascade(base, mask, dirp, nu):
    out = move_probability_cascade(
        jnp.asarray(base, jnp.float32).reshape(1, 9),
        jnp.asarray(mask, jnp.float32).reshape(1, 9),
        jnp.asarray(dirp, jnp.float32), nu)
    return np.asarray(out)[0]


def test_cascade_normal_path():
    dirp = directional_probs(0.)
    base = np.arange(9, dtype=np.float32) + 1.
    mask = np.ones(9, np.float32)
    mask[4] = 0.
    out = _cascade(base, mask, dirp, 1.0)
    want = base.copy()
    want[4] = 0.
    np.testing.assert_allclose(out / out.sum(), want / want.sum(), rtol=1e-6)


def test_cascade_nan_falls_back_to_directional():
    dirp = directional_probs(0.)
    base = np.ones(9, np.float32)
    base[3] = np.nan
    mask = np.ones(9, np.float32)
    mask[4] = 0.
    out = _cascade(base, mask, dirp, 1.0)
    np.testing.assert_allclose(out / out.sum(), dirp / dirp.sum(), rtol=1e-6)


def test_cascade_masked_to_zero_falls_back():
    dirp = directional_probs(0.)
    base = np.zeros(9, np.float32)
    base[1] = 5.  # only a masked-out move has weight
    mask = np.zeros(9, np.float32)
    mask[7] = 1.  # north allowed only
    out = _cascade(base, mask, dirp, 1.0)
    # first fallback: dirp * mask — dirp[7] > 0 so it survives
    want = np.zeros(9)
    want[7] = dirp[7]
    np.testing.assert_allclose(out / out.sum(), want / want.sum(), rtol=1e-6)


def test_cascade_double_fallback_ignores_mask():
    # mask allows only moves where the directional prior is zero ->
    # second fallback returns the unmasked prior (ssrs/movmodel.py:239-240)
    dirp = directional_probs(0.)   # north prior: south moves all zero
    base = np.zeros(9, np.float32)
    mask = np.zeros(9, np.float32)
    mask[1] = 1.  # only due-south allowed, prior-south is 0
    out = _cascade(base, mask, dirp, 1.0)
    np.testing.assert_allclose(out / out.sum(), dirp / dirp.sum(), rtol=1e-6)


def test_cascade_nu_zero_uniform_with_numpy_power_quirk():
    # NumPy 0**0 == 1: nu=0 makes every cell (even masked/center) uniform
    dirp = directional_probs(0.)
    base = np.arange(9, dtype=np.float32)
    mask = np.ones(9, np.float32)
    mask[4] = 0.
    out = _cascade(base, mask, dirp, 0.0)
    np.testing.assert_allclose(out, np.ones(9), rtol=1e-6)


def test_cascade_nu_sharpening():
    dirp = directional_probs(0.)
    base = np.array([0, 1, 2, 0, 0, 0, 0, 4, 0], np.float32)
    mask = np.ones(9, np.float32)
    mask[4] = 0.
    out = _cascade(base, mask, dirp, 2.0)
    want = base.astype(np.float64) ** 2
    np.testing.assert_allclose(out / out.sum(), want / want.sum(), rtol=1e-5)

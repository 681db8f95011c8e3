"""Terrain-derivative device kernels: Horn 3x3 slope/aspect stencils.

Reference semantics: ``compute_slope_degrees`` / ``compute_aspect_degrees``
(ssrs/layers.py:63-128) — a Horn 1981 3x3 stencil with the reference's own
axis convention. Note the reference treats axis 0 of ``z`` as *x* in its
stencil naming ("upper left" = ``z[:-2, 2:]``), so dz_dx is the gradient
along axis 0 and dz_dy along axis 1; we reproduce that exactly, border cells
are zero (the reference writes NaN then ``nan_to_num``).

TPU notes: this is a bandwidth-bound VPU stencil. XLA fuses the shifted
reads into a single pass; a Pallas variant exists in
``ssrs_tpu.fields.pallas_stencil`` and is used for large grids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _horn_gradients(z_mat: jax.Array, res: float):
    """dz_dx, dz_dy on the interior via the Horn stencil
    (ssrs/layers.py:80-90). Returns arrays of shape (nrow-2, ncol-2)."""
    z_1 = z_mat[:-2, 2:]    # "upper left"
    z_2 = z_mat[1:-1, 2:]   # "upper middle"
    z_3 = z_mat[2:, 2:]     # "upper right"
    z_4 = z_mat[:-2, 1:-1]  # "center left"
    z_6 = z_mat[2:, 1:-1]   # "center right"
    z_7 = z_mat[:-2, :-2]   # "lower left"
    z_8 = z_mat[1:-1, :-2]  # "lower middle"
    z_9 = z_mat[2:, :-2]    # "lower right"
    dz_dx = ((z_3 + 2. * z_6 + z_9) - (z_1 + 2. * z_4 + z_7)) / (8. * res)
    dz_dy = ((z_1 + 2. * z_2 + z_3) - (z_7 + 2. * z_8 + z_9)) / (8. * res)
    return dz_dx, dz_dy


@partial(jax.jit, static_argnames=())
def compute_slope_degrees(z_mat: jax.Array, res: float) -> jax.Array:
    """Terrain slope (degrees) via the Horn stencil; border cells are 0
    (ssrs/layers.py:63-93)."""
    z_mat = jnp.asarray(z_mat)
    dz_dx, dz_dy = _horn_gradients(z_mat, res)
    rise_run = jnp.sqrt(dz_dx ** 2 + dz_dy ** 2)
    interior = jnp.degrees(jnp.arctan(rise_run))
    out = jnp.zeros_like(z_mat)
    out = out.at[1:-1, 1:-1].set(interior)
    return jnp.nan_to_num(out)


@partial(jax.jit, static_argnames=())
def compute_aspect_degrees(z_mat: jax.Array, res: float) -> jax.Array:
    """Terrain aspect (degrees) via the Horn stencil; border cells are 0.

    Replicates the reference's formulation exactly
    (ssrs/layers.py:96-128): zero dz_dx is replaced by 1e-10 *before* the
    arctan ratio, and aspect = 180 - atan(dy/dx) + 90*sign(dx).
    """
    z_mat = jnp.asarray(z_mat)
    dz_dx, dz_dy = _horn_gradients(z_mat, res)
    dz_dx = jnp.where(dz_dx == 0., 1e-10, dz_dx)
    angle = jnp.degrees(jnp.arctan(dz_dy / dz_dx))
    angle_mod = 90. * dz_dx / jnp.abs(dz_dx)
    interior = 180. - angle + angle_mod
    out = jnp.zeros_like(z_mat)
    out = out.at[1:-1, 1:-1].set(interior)
    return jnp.nan_to_num(out)


def compute_slope_richdem_degrees(z_mat: jax.Array, res: float) -> jax.Array:
    """richdem-equivalent slope (ssrs/layers.py:131-148). richdem's
    'slope_degrees' attribute is the same Horn 1981 stencil this module
    implements, so this is an alias kept for API parity (richdem's C++
    core is not available here)."""
    return compute_slope_degrees(z_mat, res)


def compute_aspect_richdem_degrees(z_mat: jax.Array, res: float) -> jax.Array:
    """richdem-equivalent aspect (ssrs/layers.py:151-168); see
    ``compute_slope_richdem_degrees``. Note richdem's aspect convention
    (compass bearing of downslope) differs from the reference's own
    ``compute_aspect_degrees`` formula; the Simulator only consumes the
    latter, which is what this returns."""
    return compute_aspect_degrees(z_mat, res)


@partial(jax.jit, static_argnames=())
def compute_slope_aspect_degrees(z_mat: jax.Array, res: float):
    """Fused slope+aspect in a single pass over the DEM (both consume the
    same Horn gradients; XLA fuses the whole thing into one stencil)."""
    z_mat = jnp.asarray(z_mat)
    dz_dx, dz_dy = _horn_gradients(z_mat, res)
    rise_run = jnp.sqrt(dz_dx ** 2 + dz_dy ** 2)
    slope_in = jnp.degrees(jnp.arctan(rise_run))
    dz_dx_nz = jnp.where(dz_dx == 0., 1e-10, dz_dx)
    angle = jnp.degrees(jnp.arctan(dz_dy / dz_dx_nz))
    aspect_in = 180. - angle + 90. * dz_dx_nz / jnp.abs(dz_dx_nz)
    slope = jnp.zeros_like(z_mat).at[1:-1, 1:-1].set(slope_in)
    aspect = jnp.zeros_like(z_mat).at[1:-1, 1:-1].set(aspect_in)
    return jnp.nan_to_num(slope), jnp.nan_to_num(aspect)

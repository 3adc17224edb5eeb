"""Multilinear grid sampling (reference: ``transform.py`` grid_sample,
SURVEY.md §2 "Field ops").

``grid_sample(field, coords)`` evaluates a field at fractional index
coordinates with bi/trilinear interpolation. Differentiable w.r.t. both the
field (linear) and the coordinates (through the lerp weights) — the latter
is what makes semi-Lagrangian advection differentiable w.r.t. velocity
(TNST §4.2) and splatting differentiable w.r.t. particle positions
(LNST §4.1).

TPU notes: lowers to 2**ndim gathers + VPU lerps. XLA handles the fusion;
a Pallas gather kernel is the planned escalation if profiling shows the
gather dominating (SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp


def _corner_value(field, lo, corner, spatial_shape, mode):
    """Gather field values at integer corner offsets, handling boundary."""
    ndim = len(spatial_shape)
    idx = []
    inside = None
    for d in range(ndim):
        i = lo[..., d] + corner[d]
        if mode == "zero":
            ok = (i >= 0) & (i <= spatial_shape[d] - 1)
            inside = ok if inside is None else (inside & ok)
        i = jnp.clip(i, 0, spatial_shape[d] - 1)
        idx.append(i)
    vals = field[tuple(idx)]
    if mode == "zero":
        mask = inside
        if vals.ndim > mask.ndim:  # trailing channel axis
            mask = mask[..., None]
        vals = jnp.where(mask, vals, 0.0)
    return vals


@partial(jax.jit, static_argnames=("mode",))
def grid_sample(field: jax.Array, coords: jax.Array, mode: str = "clamp"):
    """Sample `field` at fractional index coordinates.

    Args:
      field: ``(*spatial)`` or ``(*spatial, C)`` array.
      coords: ``(..., ndim)`` fractional indices in **array-axis order**
        (coords[..., k] indexes field axis k).
      mode: 'clamp' (border replicate) or 'zero' (outside = 0).

    Returns:
      ``(...,)`` or ``(..., C)`` interpolated values.
    """
    if mode not in ("clamp", "zero"):
        raise ValueError(f"unknown boundary mode {mode!r}; "
                         "expected 'clamp' or 'zero'")
    ndim = coords.shape[-1]
    spatial_shape = field.shape[:ndim]
    has_channels = field.ndim > ndim

    coords = coords.astype(jnp.float32)
    lo_f = jnp.floor(coords)
    frac = coords - lo_f
    lo = lo_f.astype(jnp.int32)

    out = None
    for corner in itertools.product((0, 1), repeat=ndim):
        w = jnp.ones(coords.shape[:-1], dtype=field.dtype)
        for d in range(ndim):
            w = w * (frac[..., d] if corner[d] else 1.0 - frac[..., d])
        vals = _corner_value(field, lo, corner, spatial_shape, mode)
        if has_channels:
            w = w[..., None]
        term = w * vals
        out = term if out is None else out + term
    return out


def identity_coords(shape) -> jax.Array:
    """(*shape, ndim) array of integer index coordinates (axis order)."""
    axes = [jnp.arange(s, dtype=jnp.float32) for s in shape]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=-1)

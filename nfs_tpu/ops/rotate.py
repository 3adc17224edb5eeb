"""3D rotation resampling for view changes (reference: ``transform.py``
rotate, SURVEY.md §2 "Field ops"; used by the multi-view renderer, TNST §5).

``rotate3d(d, theta, phi)`` resamples the volume so that integrating the
result along axis 0 (z/depth) produces the view from azimuth ``theta``
(rotation about the vertical y axis) and elevation ``phi`` (rotation about
the x axis). Implemented as inverse-rotation coordinate resampling about the
volume center: out(x) = d(c + R^T (x - c)).

Differentiable w.r.t. both the volume and the angles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nfs_tpu.ops.interp import grid_sample, identity_coords


def rotation_matrix(theta: jax.Array, phi: jax.Array) -> jax.Array:
    """World rotation matrix in (z, y, x) array-axis coordinates.

    theta: azimuth (radians) about the y (vertical / axis-1) axis.
    phi:   elevation (radians) about the x (axis-2) axis.
    Returns R (3, 3) acting on (z, y, x) column vectors: R = R_phi @ R_theta.
    """
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    # rotation about y axis in (z, y, x): mixes z and x
    r_theta = jnp.array([[ct, 0.0, -st],
                         [0.0, 1.0, 0.0],
                         [st, 0.0, ct]])
    # rotation about x axis in (z, y, x): mixes z and y
    r_phi = jnp.array([[cp, -sp, 0.0],
                       [sp, cp, 0.0],
                       [0.0, 0.0, 1.0]])
    return r_phi @ r_theta


@partial(jax.jit, static_argnames=("mode",))
def rotate3d(d: jax.Array, theta: jax.Array, phi: jax.Array,
             mode: str = "zero") -> jax.Array:
    """Resample volume `d` (D, H, W) under view rotation (theta, phi).

    Outside-volume samples are zero (empty space) by default, matching a
    smoke volume floating in a dark background.
    """
    shape = d.shape[:3]
    center = jnp.array([(s - 1) / 2.0 for s in shape], dtype=jnp.float32)
    r = rotation_matrix(theta, phi)
    coords = identity_coords(shape) - center            # (D, H, W, 3)
    # inverse rotation = R^T for the resample
    src = coords @ r + center                           # (x - c) @ R == R^T x
    return grid_sample(d, src, mode=mode)


def rotate3d_batch(d: jax.Array, thetas: jax.Array, phis: jax.Array,
                   mode: str = "zero") -> jax.Array:
    """vmapped rotate over a batch of view angles -> (V, D, H, W)."""
    return jax.vmap(lambda t, p: rotate3d(d, t, p, mode=mode))(thetas, phis)

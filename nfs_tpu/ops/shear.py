"""Shear-decomposed volume rotation — the MXU path for view resampling.

Why: XLA lowers arbitrary trilinear resampling (nfs_tpu.ops.rotate3d) to
8 gathers, which profiled at ~600 ms fwd / ~1.1 s grad for 9 views of a
112x64x112 volume on v5e — 98% of the stylization step (SURVEY.md §7
"hard parts" #1). A rotation is exactly a composition of 1D shears
(Paeth/Tanaka three-shear decomposition):

    R(t) = Shear_u(-tan(t/2)) . Shear_v(sin t) . Shear_u(-tan(t/2))

and a 1D shear with linear interpolation is, for each slice along the
*drive* axis, a fixed translation — i.e. a 2-banded (S x S) matrix applied
along the *move* axis. Batched over the drive axis this is one einsum that
XLA maps straight onto the MXU: ~0.5 GFLOP/view instead of 9 gathers.
The volume gradient is the transposed matmul — equally MXU-native.

Accuracy: three linear-interp shears blur slightly more than one trilinear
resample; for the renderer's small view angles (tens of degrees) the
difference is visually nil and the style loss is insensitive to it (tests
bound the error vs rotate3d). Slopes grow as tan(t/2): keep |t| < ~120 deg
(the stylizer's view fans are < 60 deg total).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shear_matrix(size: int, drive_size: int, slope: jax.Array,
                  center_move: float, center_drive: float) -> jax.Array:
    """(drive_size, size, size) bank of 1D translation-interp matrices.

    Row b implements the pull-back out[i] = in(i - s_b) with
    s_b = slope * (b - center_drive), linear interpolation, zero outside:
    T[b, i, j] = max(0, 1 - |i - s_b - j|).
    """
    b = jnp.arange(drive_size, dtype=jnp.float32) - center_drive
    s = slope * b                                            # (B,)
    i = jnp.arange(size, dtype=jnp.float32)
    # (B, S_out, S_in)
    diff = (i[None, :, None] - s[:, None, None]) - i[None, None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(diff))


def shear(vol: jax.Array, move_axis: int, drive_axis: int,
          slope: jax.Array, dtype=None) -> jax.Array:
    """Pull-back shear of a 3D volume: out[x] = vol at
    x_move - slope * (x_drive - c_drive), linear interp, zero boundary,
    centered on the volume midpoint.

    dtype: optional einsum OPERAND dtype (accumulation stays f32).
    bfloat16 rides the MXU's full-rate path — interpolation weights in
    [0, 1] and smoke densities tolerate the 8-bit mantissa (error bounded
    vs the f32 shears in tests/test_shear.py).
    """
    assert vol.ndim == 3 and move_axis != drive_axis
    size = vol.shape[move_axis]
    drive_size = vol.shape[drive_axis]
    c_drive = (drive_size - 1) / 2.0
    t = _shear_matrix(size, drive_size, slope, 0.0, c_drive)

    other_axis = 3 - move_axis - drive_axis
    # bring to (drive, move, other)
    perm = (drive_axis, move_axis, other_axis)
    v = jnp.transpose(vol, perm)
    if dtype is not None:
        t = t.astype(dtype)
        v = v.astype(dtype)
    out = jnp.einsum("bij,bjo->bio", t, v,
                     preferred_element_type=jnp.float32)
    # invert the permutation
    inv = [0, 0, 0]
    for newpos, oldpos in enumerate(perm):
        inv[oldpos] = newpos
    return jnp.transpose(out, inv)


def _rotate_plane(vol: jax.Array, axis_u: int, axis_v: int,
                  angle: jax.Array, dtype=None) -> jax.Array:
    """Pull-back rotation by `angle` in the (u, v) plane via three shears.

    Matches the gather rotate's convention out(x) = vol(c + R^T (x - c))
    for the plane rotation R mixing axes (u, v) as
    u' = cos*u - sin*v ; v' = sin*u + cos*v.
    """
    # pull-back of R is a rotation by -angle of the sampling grid; the
    # three-shear factorization of that pull-back:
    a = -jnp.tan(angle / 2.0)
    b = jnp.sin(angle)
    vol = shear(vol, axis_u, axis_v, a, dtype=dtype)
    vol = shear(vol, axis_v, axis_u, b, dtype=dtype)
    vol = shear(vol, axis_u, axis_v, a, dtype=dtype)
    return vol


@partial(jax.jit, static_argnames=("dtype",))
def rotate3d_shear(d: jax.Array, theta: jax.Array,
                   phi: jax.Array, dtype=None) -> jax.Array:
    """MXU shear-decomposed equivalent of
    :func:`nfs_tpu.ops.rotate.rotate3d` (mode='zero').

    Volume (D=z, H=y, W=x); theta = azimuth about y (mixes z, x),
    phi = elevation about x (mixes z, y). Applied as theta pull-back
    first, then phi — matching rotate3d's R = R_phi @ R_theta.
    dtype: shear einsum operand dtype (render.rotation='shear_bf16').
    """
    out = _rotate_plane(d, 0, 2, theta, dtype=dtype)   # y: (z, x) plane
    out = _rotate_plane(out, 0, 1, phi, dtype=dtype)   # x: (z, y) plane
    return out


def rotate3d_shear_batch(d: jax.Array, thetas: jax.Array,
                         phis: jax.Array) -> jax.Array:
    return jax.vmap(lambda t, p: rotate3d_shear(d, t, p))(thetas, phis)

"""Spatial (tensor-parallel) sharding of the stylization pipeline
(SURVEY.md §2 parallelism inventory, TP row; VERDICT r1 missing #3):
volumes too large for one chip's HBM are sharded over a ``space`` mesh
axis and the UNMODIFIED jitted octave program runs under GSPMD — XLA
inserts the collectives (the scaling-book recipe: pick a mesh, annotate
shardings, let the partitioner work).

Why this is the TPU-native design (vs a hand-written halo scheme):
  - the persistent state that OOMs a chip — param, Adam moments m/v,
    densities, gradients, AD residuals of the advection window — is
    ELEMENTWISE over the volume, so sharding any spatial axis makes all
    of it 1/n per device with zero communication;
  - the y axis (axis 1) is chosen because the renderer's theta-rotation
    (three-shear about y, ops/shear.py) and the raymarch cumsum (along z)
    are y-local: the only ops that mix y are the phi elevation shear and
    the final image resize, for which XLA inserts transient gathers —
    peak transient = one full volume, vs ~10-20x volume persistent
    unsharded;
  - VGG + Gram losses run on (views, H, W, 3) images, thousands of times
    smaller than the volume — XLA keeps them effectively replicated.

Use :func:`prepare_spatial` once per styler, then call the normal
``stylize_frame`` with a :func:`shard_volume_spatial`'d density.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = 1  # volume axis sharded across the mesh (y; see module doc)


def spatial_mesh(n_devices: Optional[int] = None,
                 axis_name: str = "space") -> Mesh:
    """1D device mesh for spatial sharding. Defaults to all devices."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def shard_volume_spatial(d: jax.Array, mesh: Mesh,
                         axis: int = SPACE_AXIS) -> jax.Array:
    """Place a (D, H, W[, C]) volume sharded over `axis` on the mesh.
    The axis length must divide by the mesh size (pad upstream if not —
    octave shapes should be chosen divisible for large runs)."""
    spec = [None] * d.ndim
    spec[axis] = mesh.axis_names[0]
    return jax.device_put(jnp.asarray(d), NamedSharding(mesh, P(*spec)))


def replicate(tree, mesh: Mesh):
    """Commit a pytree replicated on every mesh device (small constants:
    view pools, VGG params, Gram targets)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), rep)
        if hasattr(x, "ndim") else x, tree)


def prepare_spatial(styler, mesh: Mesh) -> None:
    """Re-commit a GridStyler/ParticleStyler's device-resident constants
    as mesh-replicated so jitted calls with spatially-sharded volumes see
    a consistent device set (mixed single-device commitments otherwise
    fail placement). Idempotent."""
    oc = getattr(styler.cfg, "optim", None)
    if (oc is not None and oc.advect_impl == "auto"
            and len(mesh.devices.flatten()) > 1
            and jax.default_backend() == "tpu"):
        import warnings
        warnings.warn(
            "spatial sharding with optim.advect_impl='auto': the GSPMD "
            "partitioner cannot shard the Pallas advect kernels — set "
            "optim.advect_impl='xla' for spatially-sharded runs with "
            "window/velocity advection", stacklevel=2)
    for name in ("view_pool", "vgg_params", "gram_targets",
                 "content_feats"):
        val = getattr(styler, name, None)
        if val is not None:
            setattr(styler, name, replicate(val, mesh))


def sharded_param_init(styler, shape: Sequence[int], mesh: Mesh,
                       axis: int = SPACE_AXIS) -> jax.Array:
    """A zero init param committed with the same spatial sharding as the
    density, so the optimizer state (Adam m/v) inherits 1/n placement
    from the first octave dispatch onward."""
    p = styler.init_param(tuple(shape))
    return shard_volume_spatial(p, mesh, axis=axis)


def stylize_frame_spatial(styler, d, mesh: Mesh, axis: int = SPACE_AXIS,
                          **kwargs):
    """Spatially-sharded single-frame stylization: the standard
    ``stylize_frame`` octave loop, with the density and init param
    sharded over `axis` and the styler's constants replicated. Returns
    the usual (d_star, param, info); d_star keeps the sharding (use
    ``jax.device_get`` / np.asarray to fetch).
    """
    prepare_spatial(styler, mesh)
    d = shard_volume_spatial(d, mesh, axis=axis)
    if "init_param" not in kwargs or kwargs["init_param"] is None:
        kwargs["init_param"] = sharded_param_init(
            styler, np.asarray(d.shape), mesh, axis=axis)
    else:
        kwargs["init_param"] = shard_volume_spatial(
            kwargs["init_param"], mesh, axis=axis)
    return styler.stylize_frame(d, **kwargs)


def persistent_state_bytes(shape: Sequence[int],
                           parameterization: str = "density",
                           window_taps: int = 5) -> int:
    """Analytic per-frame persistent-state footprint (f32): density +
    param + Adam m/v + gradient + ~`window_taps` advection-window AD
    residuals — the memory that actually OOMs a chip and that spatial
    sharding divides by the mesh size (transient rotate gathers are one
    volume each and do not persist)."""
    vol = int(np.prod(shape)) * 4
    chans = len(shape) if parameterization == "velocity" else 1
    return vol + (4 * chans) * vol + window_taps * vol

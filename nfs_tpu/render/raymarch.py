"""Differentiable Beer-Lambert volume renderer (TNST §5; reference: the
renderer built inside the styler graph, SURVEY.md §1 L3 / §3.2).

Pipeline per view: rotate the density volume to the view frame
(:func:`nfs_tpu.ops.rotate3d`), then march along the depth axis with
front-to-back absorption compositing:

    C_t = sum_{s<t} rho_s                       (exclusive cumsum)
    I(u, v) = sum_t  sigma * rho_t * exp(-sigma * C_t)

which is the discrete transmittance integral (and telescopes to
``1 - exp(-sigma * C_total)`` in the continuum limit). Everything is a
cumsum + VPU elementwise chain — XLA fuses it; static shapes throughout.

2D stylization (TNST 2D configs) renders the grid itself as the image
(``render2d``), matching the reference's 2D path (SURVEY.md §2 scene row:
2D smoke ~512^2 / 256x192).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nfs_tpu.ops.rotate import rotate3d
from nfs_tpu.ops.shear import rotate3d_shear
from nfs_tpu.render.transfer import transfer_colors


def _exclusive_cumsum(x: jax.Array, axis: int) -> jax.Array:
    c = jnp.cumsum(x, axis=axis)
    return c - x


def _rotate(d: jax.Array, theta, phi, method: str) -> jax.Array:
    """View rotation: 'shear' = MXU three-shear path (default, ~150x
    faster on TPU than the gather lowering — see nfs_tpu/ops/shear.py);
    'gather' = exact trilinear resample."""
    if method == "shear":
        return rotate3d_shear(d, theta, phi)
    if method == "shear_bf16":
        # bf16 shear OPERANDS (f32 accumulate): full-rate MXU path;
        # pairs with loss.features_dtype='bfloat16'
        return rotate3d_shear(d, theta, phi, dtype=jnp.bfloat16)
    if method == "gather":
        return rotate3d(d, theta, phi, mode="zero")
    raise ValueError(f"unknown rotation method {method!r}")


@partial(jax.jit, static_argnames=("out_size", "axis"))
def raymarch(rho: jax.Array, transmit: float = 0.01, axis: int = 0,
             out_size: Optional[Tuple[int, int]] = None,
             color: Optional[jax.Array] = None) -> jax.Array:
    """Integrate a (already view-aligned) volume along `axis`.

    Args:
      rho: (D, H, W) nonneg density.
      transmit: absorption coefficient sigma (per unit density per cell).
      out_size: optional (H, W) of the output image (resized bilinearly).
      color: optional (D, H, W, 3) per-voxel color; if given the image is
        the density-weighted composited color (LNST color stylization).

    Returns:
      (H, W) grayscale or (H, W, 3) color image in [0, ~1].
    """
    rho = jnp.maximum(rho, 0.0)
    trans = jnp.exp(-transmit * _exclusive_cumsum(rho, axis=axis))
    w = transmit * rho * trans
    if color is None:
        img = jnp.sum(w, axis=axis)
    else:
        img = jnp.sum(w[..., None] * color, axis=axis)
    if out_size is not None and img.shape[:2] != tuple(out_size):
        target = tuple(out_size) + tuple(img.shape[2:])
        img = jax.image.resize(img, target, method="linear")
    return img


@partial(jax.jit,
         static_argnames=("out_size", "gamma", "method", "tf_max"))
def render_volume(d: jax.Array, theta: jax.Array, phi: jax.Array,
                  transmit: float = 0.01,
                  out_size: Optional[Tuple[int, int]] = None,
                  gamma: float = 1.0,
                  method: str = "shear",
                  tf_nodes: Optional[jax.Array] = None,
                  tf_max: float = 1.0) -> jax.Array:
    """Render one view of a (D, H, W) volume: rotate then raymarch along z.

    theta/phi in radians (azimuth about y, elevation about x). With
    `tf_nodes` (N, 3), density is mapped through the transfer function
    POST-rotation (one single-channel rotation, then colored
    compositing) and the output is (H, W, 3); otherwise (H, W) gray.
    """
    rot = _rotate(d, theta, phi, method)
    color = (None if tf_nodes is None
             else transfer_colors(rot, tf_nodes, tf_max))
    img = raymarch(rot, transmit=transmit, axis=0, out_size=out_size,
                   color=color)
    if gamma != 1.0:
        img = jnp.power(jnp.maximum(img, 1e-6), 1.0 / gamma)
    return img


@partial(jax.jit,
         static_argnames=("out_size", "gamma", "method", "tf_max"))
def render_views(d: jax.Array, thetas: jax.Array, phis: jax.Array,
                 transmit: float = 0.01,
                 out_size: Optional[Tuple[int, int]] = None,
                 gamma: float = 1.0,
                 method: str = "shear",
                 tf_nodes: Optional[jax.Array] = None,
                 tf_max: float = 1.0) -> jax.Array:
    """Render a batch of views -> (V, H, W, 3) RGB. Grayscale is tiled to
    3 channels for the CNN, as the reference does (SURVEY.md §3.2);
    with a transfer function the channels carry real color."""
    imgs = jax.vmap(
        lambda t, p: render_volume(d, t, p, transmit=transmit,
                                   out_size=out_size, gamma=gamma,
                                   method=method, tf_nodes=tf_nodes,
                                   tf_max=tf_max)
    )(thetas, phis)
    if tf_nodes is not None:
        return imgs
    return jnp.repeat(imgs[..., None], 3, axis=-1)


@partial(jax.jit,
         static_argnames=("out_size", "gamma", "compress", "tf_max"))
def render2d(d: jax.Array, out_size: Optional[Tuple[int, int]] = None,
             gamma: float = 1.0,
             color: Optional[jax.Array] = None,
             compress: str = "soft",
             tf_nodes: Optional[jax.Array] = None,
             tf_max: float = 1.0) -> jax.Array:
    """2D grid -> (H, W, 3) image; an optional (H, W, 3) color field is
    modulated by the density.

    compress: how density maps to [0, 1] brightness —
      'soft' (default): 1 - exp(-d), the 2D analogue of the 3D Beer-
        Lambert transmittance (raymarch); gradient never vanishes, so
        optimization keeps moving in saturated regions (a hard clip has
        ZERO gradient wherever base + perturbation > 1 and 2D runs
        stalled there, VERDICT r1 weak #7).
      'clip': hard clip to [0, 1] (the reference's direct-grid-image 2D
        path).
    tf_nodes: optional (N, 3) transfer function mapping DENSITY to color
      (mutually exclusive with an explicit color field).
    """
    if tf_nodes is not None:
        color = transfer_colors(d, tf_nodes, tf_max)
    if compress == "soft":
        img = 1.0 - jnp.exp(-jnp.maximum(d, 0.0))
    else:
        img = jnp.clip(d, 0.0, 1.0)
    if gamma != 1.0:
        img = jnp.power(jnp.maximum(img, 1e-6), 1.0 / gamma)
    if color is None:
        img = jnp.repeat(img[..., None], 3, axis=-1)
    else:
        img = img[..., None] * jnp.clip(color, 0.0, 1.0)
    if out_size is not None and img.shape[:2] != tuple(out_size):
        img = jax.image.resize(
            img, tuple(out_size) + (img.shape[-1],), method="linear")
    return img

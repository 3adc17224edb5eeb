"""Style-transfer objectives (TNST §4; reference: Gram/semantic/content
losses inside the styler graph, SURVEY.md §2 "Frozen loss-CNN plumbing").

- Gram style loss (Gatys): per-layer feature Gram matrices matched to the
  style image's, with per-layer weights.
- Semantic loss (DeepDream): maximize mean activation of one channel of one
  layer — the reference's `--content_layer`/`--content_channel` objective.
- Content loss: feature matching against a content image.
- Total-variation regularizer over the optimized field (2D or 3D).

Gram accumulation always happens in float32 even when VGG runs in bf16
(MXU): the C x C contraction is tiny, the precision matters.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nfs_tpu.features.vgg import vgg_features


def gram_matrix(feat: jax.Array) -> jax.Array:
    """(..., H, W, C) activations -> (..., C, C) normalized Gram matrix
    G = F^T F / (H*W*C), accumulated in f32.

    The (H, W) pixel dims are contracted DIRECTLY (one dot_general with
    two contracting dims) instead of reshaping to (HW, C) first: on TPU
    the conv-preferred activation layouts differ from the row-major
    layout a reshape pins, and XLA materialized a physical copy pair
    around each reshape (measured ~2.9 ms/iter of bf16[9,256,256,64]-
    class copies in the headline step, ~20% of device time —
    docs/ROOFLINE.md). The Gram sum is layout-agnostic math; this form
    lets XLA lay the contraction out against the conv layouts freely."""
    h, w, c = feat.shape[-3], feat.shape[-2], feat.shape[-1]
    g = jnp.einsum("...hwc,...hwd->...cd", feat, feat,
                   preferred_element_type=jnp.float32)
    return g / jnp.float32(h * w * c)


def style_gram_targets(params, style_image: jax.Array,
                       layers: Tuple[str, ...], pool: str = "avg",
                       dtype=None) -> Dict[str, jax.Array]:
    """Precompute the style image's Gram matrices. style_image: (H, W, 3)
    in [0, 1]."""
    feats = vgg_features(params, style_image[None], layers, pool=pool,
                         dtype=dtype)
    return {l: gram_matrix(f[0]) for l, f in feats.items()}


def style_loss(feats: Dict[str, jax.Array],
               target_grams: Dict[str, jax.Array],
               layers: Tuple[str, ...],
               layer_weights: Sequence[float]) -> jax.Array:
    """Mean over batch images of the weighted per-layer Gram MSE."""
    total = jnp.float32(0.0)
    for layer, lw in zip(layers, layer_weights):
        g = gram_matrix(feats[layer])                 # (N, C, C)
        gt = target_grams[layer].astype(jnp.float32)  # (C, C)
        total = total + lw * jnp.mean((g - gt) ** 2)
    return total


def semantic_loss(feats: Dict[str, jax.Array], layer: str,
                  channel: Optional[int] = None) -> jax.Array:
    """DeepDream objective (to *minimize*): negative mean activation of
    `channel` in `layer` (all channels if channel is None)."""
    f = feats[layer].astype(jnp.float32)
    if channel is not None:
        f = f[..., channel]
    return -jnp.mean(f)


def content_loss(feats: Dict[str, jax.Array],
                 target_feats: Dict[str, jax.Array],
                 layer: str) -> jax.Array:
    f = feats[layer].astype(jnp.float32)
    t = target_feats[layer].astype(jnp.float32)
    if t.ndim == f.ndim - 1:  # unbatched target vs batched views
        t = t[None]
    return jnp.mean((f - t) ** 2)


def tv_loss(field: jax.Array, ndim: Optional[int] = None) -> jax.Array:
    """Isotropic-ish total variation over the leading `ndim` spatial axes
    (all axes if None): mean squared forward difference."""
    ndim = ndim if ndim is not None else field.ndim
    total = jnp.float32(0.0)
    for ax in range(ndim):
        diff = jnp.diff(field, axis=ax)
        total = total + jnp.mean(diff.astype(jnp.float32) ** 2)
    return total

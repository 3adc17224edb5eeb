"""VGG-19 feature extractor, functional JAX (reference: TF1
``import_graph_def`` of a frozen pretrained CNN, SURVEY.md §2 "Frozen
loss-CNN plumbing"; BASELINE.json standardizes the rebuild on VGG-19).

Design: a pure function ``vgg_features(params, images, layers)`` over a
plain params dict — no framework Module state, trivially jit/vmap/shard
-able, and the conv stack lands on the MXU as large NHWC convolutions.

Weights: loaded from an ``.npz`` of ``{name}/w`` (3,3,Cin,Cout HWIO) and
``{name}/b`` arrays (see ``scripts/convert_vgg_weights.py`` for the
torchvision conversion). When no weight file is available (this
environment has no network and no cached weights — SURVEY.md §7 step-3
risk), ``init_vgg_params`` gives a *deterministic* He-normal random
network: random multi-scale conv features remain a valid style prior
(cf. Ulyanov et al., "Deep Image Prior"; random-VGG style transfer is a
known-working degradation), and every numeric test is weight-agnostic.

Compute dtype: pass ``dtype=jnp.bfloat16`` to run the conv stack in bf16
on the MXU; Gram accumulation upcasts to f32 (losses.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels); 'pool' entries mark 2x2 stride-2 pooling.
VGG_ARCH: Tuple = (
    ("conv1_1", 64), ("conv1_2", 64), "pool",
    ("conv2_1", 128), ("conv2_2", 128), "pool",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    "pool",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    "pool",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
    "pool",
)

VGG_LAYERS: Tuple[str, ...] = tuple(
    f"relu{e[0][4:]}" for e in VGG_ARCH if isinstance(e, tuple)
)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def init_vgg_params(seed: int = 0, dtype=jnp.float32) -> Dict[str, Dict[str, jax.Array]]:
    """Deterministic He-normal random VGG-19 params (fallback when no
    pretrained weights are on disk)."""
    key = jax.random.PRNGKey(seed)
    params = {}
    c_in = 3
    for entry in VGG_ARCH:
        if entry == "pool":
            continue
        name, c_out = entry
        key, wk = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        w = jax.random.normal(wk, (3, 3, c_in, c_out), dtype=jnp.float32)
        w = w * jnp.sqrt(2.0 / fan_in)
        params[name] = {
            "w": w.astype(dtype),
            "b": jnp.zeros((c_out,), dtype=dtype),
        }
        c_in = c_out
    return params


def load_vgg_params(path: str, dtype=jnp.float32) -> Dict[str, Dict[str, jax.Array]]:
    """Load params from an .npz of '{name}/w' + '{name}/b' arrays."""
    raw = np.load(path)
    params = {}
    for entry in VGG_ARCH:
        if entry == "pool":
            continue
        name, _ = entry
        params[name] = {
            "w": jnp.asarray(raw[f"{name}/w"], dtype=dtype),
            "b": jnp.asarray(raw[f"{name}/b"], dtype=dtype),
        }
    return params


def save_vgg_params(path: str, params) -> None:
    flat = {}
    for name, p in params.items():
        flat[f"{name}/w"] = np.asarray(p["w"], dtype=np.float32)
        flat[f"{name}/b"] = np.asarray(p["b"], dtype=np.float32)
    np.savez(path, **flat)


def get_vgg_params(path: Optional[str] = None, seed: int = 0,
                   dtype=jnp.float32):
    """File-based loader with deterministic random fallback."""
    if path is not None:
        return load_vgg_params(path, dtype=dtype)
    return init_vgg_params(seed=seed, dtype=dtype)


def preprocess(images: jax.Array) -> jax.Array:
    """[0,1] RGB (..., H, W, 3) -> ImageNet-normalized (torch convention)."""
    mean = jnp.asarray(_IMAGENET_MEAN, dtype=images.dtype)
    std = jnp.asarray(_IMAGENET_STD, dtype=images.dtype)
    return (images - mean) / std


def _pool(x: jax.Array, kind: str) -> jax.Array:
    if kind == "avg":
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) * 0.25
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@partial(jax.jit, static_argnames=("layers", "pool", "dtype", "precision"))
def vgg_features(params, images: jax.Array,
                 layers: Tuple[str, ...],
                 pool: str = "avg",
                 dtype=None,
                 precision=None) -> Dict[str, jax.Array]:
    """Run VGG-19 and return the requested relu activations.

    Args:
      params: dict from init/load_vgg_params.
      images: (N, H, W, 3) in [0, 1] (un-normalized; preprocessing happens
        here).
      layers: relu layer names, e.g. ('relu1_1', 'relu2_1', ...). The
        network is only evaluated as deep as the deepest requested layer.
      pool: 'avg' (smoother style gradients, Gatys-style) or 'max'
        (torchvision-faithful).
      dtype: compute dtype (e.g. jnp.bfloat16 for the MXU); None keeps the
        input dtype.
      precision: jax.lax.Precision for the convs. None = backend default
        (fast MXU path on TPU); use Precision.HIGHEST for bitwise numeric
        cross-checks.

    Returns:
      {layer_name: (N, H_l, W_l, C_l) activation}, in the images' dtype.
    """
    want = set(layers)
    unknown = want - set(VGG_LAYERS)
    if unknown:
        raise ValueError(f"unknown VGG layers: {sorted(unknown)}")
    deepest = max(VGG_LAYERS.index(l) for l in layers) if layers else -1

    x = preprocess(images)
    if dtype is not None:
        x = x.astype(dtype)
    feats: Dict[str, jax.Array] = {}
    conv_idx = -1
    for entry in VGG_ARCH:
        if entry == "pool":
            x = _pool(x, pool)
            continue
        conv_idx += 1
        if conv_idx > deepest:
            break
        name, _ = entry
        w = params[name]["w"].astype(x.dtype)
        b = params[name]["b"].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
            precision=precision,
        ) + b
        x = jax.nn.relu(x)
        rname = f"relu{name[4:]}"
        if rname in want:
            feats[rname] = x
    return feats

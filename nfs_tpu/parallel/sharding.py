"""Sharded stylization: frame-parallel temporal windows with ppermute
halos + view-parallel rendering with psum reductions (SURVEY.md §2
parallelism inventory; no reference equivalent — single-GPU there).

The core export is :func:`make_sharded_window_step`: ONE jitted SPMD
training step that advances Adam on ALL frames of a sequence window-batch
simultaneously:

  - opt params, densities, and sim velocities are sharded over ``frames``;
  - each shard fetches +-W neighbor frames' velocities via ring
    ``ppermute`` over ICI (:func:`halo_exchange`) — no duplicated frame
    data in HBM;
  - camera views are sharded over ``views``; each views-shard renders its
    slice of the Poisson-disk view set and computes a partial loss;
    ``psum`` over ``views`` totals it (shard_map autodiff then psums the
    parameter gradients automatically);
  - Adam updates are local to each frame shard (parameters are
    frame-local), so the only collectives per step are the halo ppermutes
    and the views psum — both ICI-resident.

This replaces the reference's strictly sequential frame loop with
near-linear frame scaling (SURVEY.md §5 "long-context" reinterpretation).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jax.Array, halo: int, axis_name: str,
                  clamp_edges: bool = True):
    """Fetch `halo` boundary elements from ring neighbors along a sharded
    leading axis.

    Args:
      x: (L, ...) local chunk of a globally (n*L, ...) array sharded over
        `axis_name`.
      halo: number of elements to fetch from each side (halo <= L).
      clamp_edges: if True, the global first/last shard receives an
        edge-replicated halo instead of the wrapped-around one (matching
        the sequence stylizer's clamp-at-boundary frame indexing).

    Returns:
      (left, right): (halo, ...) arrays — the left neighbor's last `halo`
      elements and the right neighbor's first `halo` elements.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # left halo: every shard sends its LAST `halo` elems to its right
    # neighbor; equivalently we receive from the left neighbor.
    left = jax.lax.ppermute(
        x[-halo:], axis_name, [(j, (j + 1) % n) for j in range(n)])
    # right halo: receive the first `halo` elems from the right neighbor.
    right = jax.lax.ppermute(
        x[:halo], axis_name, [(j, (j - 1) % n) for j in range(n)])
    if clamp_edges:
        left = jnp.where(idx == 0,
                         jnp.broadcast_to(x[:1], left.shape), left)
        right = jnp.where(idx == n - 1,
                          jnp.broadcast_to(x[-1:], right.shape), right)
    return left, right


def shard_volume(d: jax.Array, mesh: Mesh, axis: int = -1,
                 mesh_axis: str = "views") -> jax.Array:
    """Spatially shard a (large) volume across `mesh_axis` with pjit-style
    NamedSharding (SURVEY.md §2 TP row: shard the spatial field, not the
    CNN). XLA inserts the halo collectives that resampling gathers need.
    """
    ndim = d.ndim
    axis = axis % ndim
    spec = [None] * ndim
    spec[axis] = mesh_axis
    return jax.device_put(d, NamedSharding(mesh, P(*spec)))


def make_sharded_window_step(
    mesh: Mesh,
    loss_one_frame: Callable,
    optimizer: optax.GradientTransformation,
    window: int,
    n_views: int,
    opt_state_example=None,
):
    """Build the jitted SPMD step for frame-parallel window stylization.

    Args:
      mesh: (frames, views) mesh from make_mesh.
      loss_one_frame: (param, d, vels_window, views, key, aux) -> scalar
        partial loss for ONE frame rendered under `views` (a subset of the
        frame's view set). Must be vmappable and pure.
      optimizer: optax transformation (stable identity).
      window: temporal half-width W (halo depth in frames).
      n_views: total views per frame; divided across the `views` mesh axis.
        loss_one_frame must weight its partial loss so that SUMMING over
        view shards yields the full per-frame loss (e.g. divide by the
        global n_views, not the local subset size).
      opt_state_example: an optimizer state pytree used to derive per-leaf
        shardings (array leaves with a leading frame axis shard over
        ``frames``; scalar leaves like Adam's step count stay replicated).
        Defaults to a zero-param probe of `optimizer`.

    Returns:
      step(params, opt_state, d, vels, view_sets, keys, aux)
        -> (params, opt_state, mean_loss)
      with leading-axis-`frames` sharding on params/opt_state/d/vels/keys
      and view_sets sharded over `views`. All arguments are global arrays;
      the function is a shard_map under jit so single-controller code just
      calls it.
    """
    n_frames_shards = mesh.shape["frames"]
    n_view_shards = mesh.shape["views"]
    assert n_views % n_view_shards == 0

    frames_spec = P("frames")
    # view sets: (T, n_views, 2) sharded over views on axis 1
    views_spec = P("frames", "views")

    def _local_step(params, opt_state, d, vels, view_sets, keys, aux):
        # shapes inside shard_map (per shard):
        #   params: (L, *param_shape)   d: (L, *spatial)
        #   vels:   (L, *spatial, nd)   view_sets: (L, n_views/vs, 2)
        #   keys:   (L, 2) uint32
        if window > 0:
            left, right = halo_exchange(vels, window, "frames")
            vels_pad = jnp.concatenate([left, vels, right], axis=0)
        else:
            vels_pad = vels

        L = d.shape[0]

        def frame_loss(i, param, d_i, views_i, key_i):
            if window > 0:
                # (2W, *spatial, nd) window of velocities for frame i:
                # global frames [t-W, t+W-1] == padded [i, i+2W)
                vw = jax.lax.dynamic_slice_in_dim(vels_pad, i, 2 * window,
                                                  axis=0)
            else:
                vw = None
            return loss_one_frame(param, d_i, vw, views_i, key_i, aux)

        def batched_loss(params):
            losses = jax.vmap(frame_loss)(
                jnp.arange(L), params, d, view_sets, keys)
            # total over local frames; views-partial -> psum over views
            total = jnp.sum(losses)
            return jax.lax.psum(total, "views")

        loss, grads = jax.value_and_grad(batched_loss)(params)
        # view shards hold identical params; grads were psum'd by AD
        # through the loss psum. Frame shards update locally.
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # after the views psum, `loss` is the sum of FULL per-frame losses
        # over local frames; psum over frames -> global sum over T frames.
        mean_loss = jax.lax.psum(loss, "frames") / (L * n_frames_shards)
        return params, opt_state, mean_loss

    def _leaf_spec(x):
        return frames_spec if getattr(x, "ndim", 0) > 0 else P()

    if opt_state_example is None:
        opt_state_example = optimizer.init(
            jnp.zeros((n_frames_shards, 1), jnp.float32))
    opt_state_specs = jax.tree.map(_leaf_spec, opt_state_example)

    in_specs = (frames_spec, opt_state_specs, frames_spec, frames_spec,
                views_spec, frames_spec, P())
    out_specs = (frames_spec, opt_state_specs, P())

    sharded = shard_map(_local_step, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded)

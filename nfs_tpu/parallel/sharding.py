"""Sharded stylization: frame-parallel temporal windows with ppermute
halos + view-parallel rendering with psum reductions (SURVEY.md §2
parallelism inventory; no reference equivalent — single-GPU there).

The core export is :func:`make_sharded_window_step`: ONE jitted SPMD
dispatch that advances Adam for ``n_iters`` iterations on ALL frames of a
sequence window-batch simultaneously:

  - opt params, densities, and sim velocities are sharded over ``frames``;
  - each shard fetches +-W neighbor frames' velocities via ring
    ``ppermute`` over ICI (:func:`halo_exchange`) — no duplicated frame
    data in HBM (windows deeper than the local shard fall back to an
    all_gather of the velocity stack);
  - camera views are sharded over ``views``; each views-shard renders its
    slice of the per-iteration Poisson-disk view set and computes a
    partial loss; the parameter gradients are EXPLICITLY ``psum``-reduced
    over ``views`` before the optimizer update (shard_map with
    check_vma=False does NOT do this automatically — differentiating
    through a psum'd loss yields only the local shard's partial gradient);
  - the whole iteration loop is a ``lax.scan`` inside the sharded step:
    view-pool indexing runs on device from per-frame PRNG keys and losses
    stay on device, so one octave is one (or a few) dispatches no matter
    the iteration count — no per-iteration host sync;
  - Adam updates are local to each frame shard (parameters are
    frame-local), so the only collectives per iteration are the views
    psum (the halo ppermutes happen once per dispatch) — ICI-resident.

This replaces the reference's strictly sequential frame loop with
near-linear frame scaling (SURVEY.md §5 "long-context" reinterpretation).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
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
      halo: number of elements to fetch from each side. halo <= L uses a
        single ring ppermute per side; halo > L (temporal window deeper
        than the local shard) falls back to a tiled ``all_gather`` + slice
        — more bytes on the wire, but correct in the heavy-coupling regime
        the single-hop path would silently truncate (SURVEY.md §7 hard
        part 5).
      clamp_edges: if True, out-of-range global positions replicate the
        global first/last element (matching the sequence stylizer's
        clamp-at-boundary frame indexing) instead of wrapping around.

    Returns:
      (left, right): (halo, ...) arrays — the `halo` elements immediately
      before / after this shard's global range.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    L = x.shape[0]
    if halo <= L:
        # left halo: every shard sends its LAST `halo` elems to its right
        # neighbor; equivalently we receive from the left neighbor.
        left = jax.lax.ppermute(
            x[-halo:], axis_name, [(j, (j + 1) % n) for j in range(n)])
        # right halo: receive the first `halo` elems from the right
        # neighbor.
        right = jax.lax.ppermute(
            x[:halo], axis_name, [(j, (j - 1) % n) for j in range(n)])
        if clamp_edges:
            left = jnp.where(idx == 0,
                             jnp.broadcast_to(x[:1], left.shape), left)
            right = jnp.where(idx == n - 1,
                              jnp.broadcast_to(x[-1:], right.shape), right)
        return left, right

    # deep-halo fallback: window wider than the local shard.
    full = jax.lax.all_gather(x, axis_name, tiled=True)  # (n*L, ...)
    total = n * L
    start = idx * L
    li = jnp.arange(-halo, 0) + start
    ri = jnp.arange(0, halo) + start + L
    if clamp_edges:
        li = jnp.clip(li, 0, total - 1)
        ri = jnp.clip(ri, 0, total - 1)
    else:
        li = li % total
        ri = ri % total
    return jnp.take(full, li, axis=0), jnp.take(full, ri, axis=0)


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
    n_iters: int = 1,
):
    """Build the jitted SPMD multi-iteration step for frame-parallel
    window stylization.

    Args:
      mesh: (frames, views) mesh from make_mesh.
      loss_one_frame: (param, d, vels_window, views, key, aux) -> scalar
        partial loss for ONE frame rendered under `views` (this shard's
        slice of the frame's view set). Must be vmappable and pure, and
        must weight its partial loss so that SUMMING over view shards
        yields the full per-frame loss (e.g. scale by
        local_views / n_views).
      optimizer: optax transformation (stable identity).
      window: temporal half-width W (halo depth in frames).
      n_views: total views per frame; divided across the `views` mesh
        axis.
      opt_state_example: an optimizer state pytree used to derive per-leaf
        shardings (array leaves with a leading frame axis shard over
        ``frames``; scalar leaves like Adam's step count stay replicated).
        Defaults to a zero-param probe of `optimizer`.
      n_iters: Adam iterations per dispatch (a lax.scan inside the sharded
        step). Each iteration draws its frame view-set on device:
        ``pool[randint(fold_in(fold_in(keys[t], it0+i), 1))]``, views-axis
        slice taken per shard.

    Returns:
      step(params, opt_state, d, vels, pool, keys, aux, it0)
        -> (params, opt_state, losses)
      with leading-axis-`frames` sharding on params/opt_state/d/vels/keys;
      `pool` is the replicated (P, n_views, C) Poisson view pool (C=2
      angle columns, or 3 with a per-view weight column that
      loss_one_frame may consume for view padding); `it0` is
      the global iteration offset (traced scalar, so chunked calls
      continue the PRNG stream without recompiling); `losses` is the
      (n_iters,) per-iteration global mean loss, left on device. All
      arguments are global arrays; the function is a shard_map under jit
      so single-controller code just calls it.
    """
    n_frames_shards = mesh.shape["frames"]
    n_view_shards = mesh.shape["views"]
    if n_views % n_view_shards != 0:
        raise ValueError(
            f"n_views={n_views} must divide the views mesh axis "
            f"({n_view_shards}); pad the view pool with weight-0 views "
            f"(ParallelSequenceStyler does this automatically)")
    nv_local = n_views // n_view_shards
    # composed (frames, views, space) mesh: frames/views stay MANUAL
    # (ppermute halos + psum grad reductions below); the space axis is
    # left AUTO so GSPMD partitions each frame's volume — exactly the
    # single-frame TP design (parallel/spatial.py), composed under the
    # frame/view shard_map. Volume-mixing ops (advection taps, shears,
    # resizes) get their halo collectives inserted by XLA.
    has_space = "space" in mesh.axis_names

    def _space_constrain(x, ndim_spatial):
        """Pin a (L, *spatial[, c]) per-shard array's y axis (3D; x for
        2D — any volume axis works there) to the `space` mesh axis.
        Odd-sized (coarse-octave) axes stay unconstrained: GSPMD shardings
        need divisibility, and the memory win lives at the fine octaves."""
        if not has_space:
            return x
        dim = 2 if ndim_spatial == 3 else 1
        if x.shape[dim] % mesh.shape["space"] != 0:
            return x
        spec = [None] * x.ndim
        spec[dim] = "space"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    frames_spec = P("frames")

    def _local_run(params, opt_state, d, vels, pool, keys, aux, it0):
        # shapes inside shard_map (per shard):
        #   params: (L, *param_shape)   d: (L, *spatial)
        #   vels:   (L, *spatial, nd)   pool: (P, n_views, 2) replicated
        #   keys:   (L, 2) uint32       it0: () int32 replicated
        nds = d.ndim - 1  # spatial rank
        if has_space:
            d = _space_constrain(d, nds)
            vels = _space_constrain(vels, nds)
            params = _space_constrain(params, nds)
        if window > 0:
            left, right = halo_exchange(vels, window, "frames")
            vels_pad = jnp.concatenate([left, vels, right], axis=0)
        else:
            vels_pad = None

        L = d.shape[0]
        v_idx = jax.lax.axis_index("views")

        def one_iter(carry, it):
            params, opt_state = carry

            def frame_loss(i, param, d_i, key_i):
                kit = jax.random.fold_in(key_i, it)
                p_i = jax.random.randint(
                    jax.random.fold_in(kit, 1), (), 0, pool.shape[0])
                views_i = jax.lax.dynamic_slice_in_dim(
                    pool[p_i], v_idx * nv_local, nv_local, axis=0)
                if window > 0:
                    # (2W, *spatial, nd) window of velocities for frame i:
                    # global frames [t-W, t+W-1] == padded [i, i+2W)
                    vw = jax.lax.dynamic_slice_in_dim(
                        vels_pad, i, 2 * window, axis=0)
                else:
                    vw = None
                return loss_one_frame(param, d_i, vw, views_i,
                                      jax.random.fold_in(kit, 2), aux)

            def batched_loss(ps):
                losses = jax.vmap(frame_loss)(
                    jnp.arange(L), ps, d, keys)
                return jnp.sum(losses)  # frames-local, views-partial

            loss, grads = jax.value_and_grad(batched_loss)(params)
            # Each views-shard holds a full params replica but computed
            # only its views' partial gradient; reduce explicitly (AD
            # through a psum'd loss does NOT insert this reduction under
            # check_vma=False — skipping it silently optimizes only the
            # first shard's views).
            grads = jax.lax.psum(grads, "views")
            loss = jax.lax.psum(loss, "views")
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if has_space:  # keep the carry pinned across scan iterations
                params = _space_constrain(params, nds)
            # `loss` is now the sum of FULL per-frame losses over local
            # frames; psum over frames -> global sum over T frames.
            mean_loss = jax.lax.psum(loss, "frames") / (L * n_frames_shards)
            return (params, opt_state), mean_loss

        (params, opt_state), losses = jax.lax.scan(
            one_iter, (params, opt_state), it0 + jnp.arange(n_iters))
        return params, opt_state, losses

    def _leaf_spec(x):
        return frames_spec if getattr(x, "ndim", 0) > 0 else P()

    if opt_state_example is None:
        opt_state_example = optimizer.init(
            jnp.zeros((n_frames_shards, 1), jnp.float32))
    opt_state_specs = jax.tree.map(_leaf_spec, opt_state_example)

    in_specs = (frames_spec, opt_state_specs, frames_spec, frames_spec,
                P(), frames_spec, P(), P())
    out_specs = (frames_spec, opt_state_specs, P())

    kw = {}
    if has_space:
        # partial-manual: frames/views manual, space left to GSPMD
        kw["axis_names"] = frozenset({"frames", "views"})
    sharded = shard_map(_local_run, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False, **kw)
    return jax.jit(sharded)

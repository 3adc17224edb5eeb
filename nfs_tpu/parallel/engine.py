"""Frame-parallel sequence stylization engine — the multi-chip front-end
(north-star workload: a 200-frame 112x64x112 smoke sequence on v5e-8,
BASELINE.json).

Where the reference (and our single-device ``GridStyler.stylize_sequence``)
walks frames sequentially with a recursive warm start (TNST §6), this
engine optimizes ALL frames JOINTLY: per-frame stylization variables are
sharded over the ``frames`` mesh axis, every Adam step evaluates every
frame's Gaussian-window transport loss (neighbor velocities fetched via
ring ppermute halos over ICI), and camera views shard over the ``views``
axis with psum gradient reduction. Joint optimization with window coupling
is a *stronger* temporal-coherence formulation than the reference's
sequential recursive blend — neighbor frames co-adapt instead of
inheriting — and it scales near-linearly in sequence length.

Octaves work exactly as in the single-frame path: coarse-to-fine resizes
of the (T, *spatial) parameter stack, one compiled step per octave shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nfs_tpu.ops.advect import advect
from nfs_tpu.ops.resize import octave_shapes, resize
from nfs_tpu.parallel.mesh import make_mesh, mesh_shape_for
from nfs_tpu.parallel.sharding import make_sharded_window_step
from nfs_tpu.render.camera import poisson_view_pool
from nfs_tpu.styler.grid import GridStyler


class ParallelSequenceStyler:
    """Wraps a GridStyler's loss pipeline into the sharded window step."""

    def __init__(self, styler: GridStyler, mesh=None):
        self.styler = styler
        self.cfg = styler.cfg
        if mesh is None:
            f, v = mesh_shape_for(len(jax.devices()))
            mesh = make_mesh(frames=f, views=v)
        self.mesh = mesh
        self._loss_cache = {}
        self._step_cache = {}

    # ------------------------------------------------------------- #

    def _get_loss_one_frame(self, ndim: int, window: int,
                            render_size=None):
        render_size = render_size or self.cfg.render.render_size
        sig = (ndim, window, tuple(render_size))
        if sig in self._loss_cache:
            return self._loss_cache[sig]
        styler = self.styler
        cfg = self.cfg
        n_views_total = cfg.render.n_views
        weights = (styler._window_weights(window) if window else None)

        def render_imgs(d_star, views_i):
            if d_star.ndim == 2:
                from nfs_tpu.render.raymarch import render2d
                return render2d(d_star, out_size=render_size,
                                gamma=cfg.render.gamma)[None]
            from nfs_tpu.render.raymarch import render_views
            return render_views(
                d_star, views_i[:, 0], views_i[:, 1],
                transmit=cfg.render.transmit,
                out_size=render_size, gamma=cfg.render.gamma,
                method=cfg.render.rotation)

        def loss_one_frame(param, d_i, vels_w, views_i, key_i, aux):
            d_star = styler._apply_param(param, d_i)
            if window == 0:
                total = styler._image_loss(render_imgs(d_star, views_i),
                                           aux)
            else:
                # all 2W+1 transported states, then ONE batched VGG call
                # with per-position Gram weighting (same trick as the
                # single-device window loss — bitwise-equal total, bigger
                # MXU conv batches)
                md = cfg.optim.max_disp
                states = [None] * (2 * window + 1)
                states[window] = d_star
                d_j = d_star
                for j in range(1, window + 1):
                    d_j = advect(d_j, vels_w[window + j - 1], max_disp=md)
                    states[window + j] = d_j
                d_j = d_star
                for j in range(1, window + 1):
                    d_j = advect(d_j, -vels_w[window - j], max_disp=md)
                    states[window - j] = d_j
                imgs = jnp.stack([render_imgs(s, views_i)
                                  for s in states])
                total = styler._image_loss_weighted(imgs, weights, aux)
            if cfg.loss.w_tv:
                from nfs_tpu.features.losses import tv_loss
                total += cfg.loss.w_tv * tv_loss(param, ndim=ndim)
            # views-shard partial weighting: 3D shards render
            # views_i.shape[0] of n_views_total views; 2D replicates the
            # single render, so divide by the shard count — either way the
            # views-psum reconstructs the full per-frame loss exactly.
            if d_i.ndim == 3:
                total = total * (views_i.shape[0] / n_views_total)
            else:
                total = total / self.mesh.shape["views"]
            return total

        self._loss_cache[sig] = loss_one_frame
        return loss_one_frame

    # ------------------------------------------------------------- #

    def stylize(self, densities: np.ndarray,
                velocities: Optional[np.ndarray] = None,
                key: Optional[jax.Array] = None,
                callback=None):
        """Jointly stylize a (T, *spatial) sequence on the mesh.

        T must be divisible by the mesh's `frames` axis. Returns
        (d_star (T, *spatial), params, info).
        """
        cfg = self.cfg
        oc = cfg.optim
        styler = self.styler
        mesh = self.mesh
        T = densities.shape[0]
        assert T % mesh.shape["frames"] == 0, (
            f"{T} frames not divisible by frames axis "
            f"{mesh.shape['frames']}")
        spatial = densities.shape[1:]
        ndim = len(spatial)
        window = oc.window if velocities is not None else 0
        v_shards = mesh.shape["views"]
        # 2D renders the grid directly (no view batch): carry a dummy
        # (T, v_shards, 2) views array so the views axis still shards.
        n_views = cfg.render.n_views if ndim == 3 else v_shards
        assert n_views % v_shards == 0
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)

        d_full = jnp.asarray(densities, jnp.float32)
        vels_full = (jnp.asarray(velocities, jnp.float32)
                     if velocities is not None else None)

        # device-resident poisson view pool, indexed ON DEVICE inside the
        # scanned step from per-frame PRNG keys
        if ndim == 3 and styler.view_pool is not None \
                and styler.view_pool.shape[1] == n_views:
            pool = jnp.asarray(styler.view_pool)
        else:
            pool = jnp.asarray(poisson_view_pool(
                cfg.render.view_pool, n_views,
                (cfg.render.theta0, cfg.render.theta1),
                (cfg.render.phi0, cfg.render.phi1), seed=cfg.seed))

        optimizer = styler._optimizer

        shapes = octave_shapes(spatial, oc.octave_n, oc.octave_scale)
        params = jax.vmap(lambda _: styler.init_param(spatial))(
            jnp.arange(T))
        info = {"octave_losses": []}
        base_keys = jax.vmap(
            lambda t: jax.random.fold_in(key, t))(jnp.arange(T))

        for o, shape in enumerate(shapes):
            is_vel = oc.parameterization == "velocity"
            params = jax.vmap(
                lambda p: resize(p, shape, is_velocity=is_vel))(params) \
                if params.shape[1:1 + ndim] != tuple(shape) else params
            d_o = jax.vmap(lambda x: resize(x, shape))(d_full) \
                if tuple(shape) != spatial else d_full
            if window:
                vels_o = jax.vmap(
                    lambda v: resize(v, shape, is_velocity=True))(
                        vels_full) if tuple(shape) != spatial else vels_full
            else:
                vels_o = jnp.zeros((T,) + tuple(shape) + (ndim,),
                                   jnp.float32)

            # per-octave render scaling (matches GridStyler)
            render_size = styler._octave_render_size(shape, spatial)
            loss_one = self._get_loss_one_frame(ndim, window, render_size)

            aux = {
                "vgg": styler.vgg_params,
                "targets": styler.gram_targets,
                "content": styler.content_feats,
            }
            opt_state = optimizer.init(params)
            # keys differ per octave so octaves draw fresh view sets
            keys_o = jax.vmap(
                lambda k: jax.random.fold_in(k, o))(base_keys)

            # whole-octave on-device iteration scan: one dispatch per
            # chunk (= all iters when nobody is watching); `it0` is traced
            # so chunked calls share one executable per chunk length
            chunk = oc.log_every if callback is not None else oc.iters
            losses_dev = []
            done = 0
            while done < oc.iters:
                n_it = min(chunk, oc.iters - done)
                step_sig = (tuple(shape), window, ndim,
                            tuple(render_size), n_it)
                if step_sig not in self._step_cache:
                    self._step_cache[step_sig] = make_sharded_window_step(
                        mesh, loss_one, optimizer, window=window,
                        n_views=n_views,
                        opt_state_example=optimizer.init(params),
                        n_iters=n_it)
                step = self._step_cache[step_sig]
                params, opt_state, losses = step(
                    params, opt_state, d_o, vels_o, pool, keys_o, aux,
                    jnp.int32(done))
                losses_dev.append(losses)  # stays on device
                done += n_it
                if callback is not None:
                    callback(done, float(losses[-1]), octave=o)
            info["octave_losses"].append(
                np.asarray(jnp.concatenate(losses_dev)))

        d_star = jax.vmap(styler._apply_param)(params, d_full)
        d_star = jnp.maximum(d_star, 0.0)
        return d_star, params, info

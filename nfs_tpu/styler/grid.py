"""TNST grid stylization engine (reference: ``styler.py`` class Styler,
SURVEY.md §2/§3.2-3.3; TNST arXiv:1905.07442).

Capabilities, matching the reference's public surface:
  - 2D (H, W) and 3D (D, H, W) smoke density grids;
  - parameterizations: additive density perturbation ``d* = d + dd`` or
    transport/velocity ``d* = advect(d, v_hat)`` (TNST §4.2);
  - losses: Gram style vs a style image, semantic (DeepDream channel)
    and/or content feature matching, TV regularizer (TNST §4);
  - multi-view differentiable rendering with Poisson-disk camera sampling
    for 3D (TNST §5), direct grid image for 2D;
  - multi-scale octave Adam optimization (coarse -> fine);
  - temporal coherence: Gaussian-weighted window transport losses and
    recursive sequence stylization (TNST §6).

TPU-native design: per octave, the full iteration loop is one jitted
lax.scan (on-device optax Adam, on-device view-pool indexing); the host
only resizes between octaves and logs. All arrays (densities, VGG params,
Gram targets, camera pools) are threaded through the scan as traced
arguments, and the loss closure + optimizer are cached per structural
signature — so a sequence compiles once per octave shape and then streams
every frame through the same executables. No per-iteration host sync
(unlike the reference, SURVEY.md §3.2).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nfs_tpu.core.config import StyleConfig
from nfs_tpu.features.vgg import get_vgg_params, vgg_features
from nfs_tpu.features.losses import (
    content_loss,
    semantic_loss,
    style_gram_targets,
    style_loss,
    tv_loss,
)
from nfs_tpu.io.image import load_image
from nfs_tpu.ops.advect import advect, advect_maccormack
from nfs_tpu.ops.resize import octave_shapes, resize
from nfs_tpu.render.camera import poisson_view_pool, sample_views_stratified
from nfs_tpu.render.raymarch import render2d, render_views
from nfs_tpu.styler.octave import run_octave


@partial(jax.jit, static_argnames=("step_fn",), donate_argnums=(0,))
def _seq_chunk_block(param, t_glob, t_loc, keys, valid, dens, vels, data,
                     step_fn):
    """Block-streamed variant of :func:`_seq_chunk`: dens covers only a
    block of the sequence (indexed by t_loc) and vels is the block's
    velocity CONTEXT, pre-padded with the window halo on both sides —
    so whole sequences never need to be device-resident and host IO of
    block k+1 overlaps the device compute of block k (dispatches are
    async). `valid` masks carry updates for tail-padding steps (padded
    steps keep the carry unchanged, so a padded tail chunk reuses the
    full-chunk executable instead of recompiling — O(minutes) on a
    remote TPU)."""
    def body(p, xs):
        tg, tl, key, ok = xs
        p_new, d_star, losses = step_fn(p, tg, tl, key, dens, vels, data)
        p = jax.tree.map(lambda a, b: jnp.where(ok, a, b), p_new, p)
        return p, (d_star, losses)

    param, (d_stars, losses) = jax.lax.scan(body, param,
                                            (t_glob, t_loc, keys, valid))
    return param, d_stars, losses


@partial(jax.jit, static_argnames=("step_fn",), donate_argnums=(0,))
def _seq_chunk(param, t_idx, keys, valid, dens, vels, data, step_fn):
    """Scan `step_fn` (one frame's FULL multi-octave optimization) over a
    chunk of frames in a single device dispatch — the whole-sequence
    single-dispatch path (SURVEY.md §7 design stance: no per-frame Python
    dispatch, no per-frame host crossing; dens/vels stay device-resident
    and are indexed inside the scan). `valid` masks carry updates for
    tail-padding steps (see :func:`_seq_chunk_block`)."""
    def body(p, xs):
        t, key, ok = xs
        p_new, d_star, losses = step_fn(p, t, key, dens, vels, data)
        p = jax.tree.map(lambda a, b: jnp.where(ok, a, b), p_new, p)
        return p, (d_star, losses)

    param, (d_stars, losses) = jax.lax.scan(body, param,
                                            (t_idx, keys, valid))
    return param, d_stars, losses


class GridStyler:
    """Grid (smoke) stylizer. Host-side orchestration only; all compute
    jitted on device."""

    def __init__(self, cfg: StyleConfig, vgg_params=None,
                 style_image: Optional[np.ndarray] = None,
                 content_image: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.vgg_params = (vgg_params if vgg_params is not None else
                           get_vgg_params(cfg.loss.vgg_weights,
                                          seed=cfg.seed))
        lc = cfg.loss
        rc = cfg.render

        if style_image is None and lc.style_target:
            style_image = load_image(lc.style_target, size=rc.render_size)
        self.style_image = style_image
        self.gram_targets = None
        if style_image is not None:
            self.gram_targets = style_gram_targets(
                self.vgg_params, jnp.asarray(style_image),
                lc.style_layers, pool=lc.pool)

        if content_image is None and lc.content_target:
            content_image = load_image(lc.content_target,
                                       size=rc.render_size)
        self.content_feats = None
        if content_image is not None and lc.content_layer:
            self.content_feats = vgg_features(
                self.vgg_params, jnp.asarray(content_image)[None],
                (lc.content_layer,), pool=lc.pool)

        # optional density -> RGB transfer function (colored smoke;
        # nfs_tpu/render/transfer.py). Resolved once; constant across
        # frames, so it is closed over by the cached loss closures.
        self.tf_nodes = None
        if rc.transfer_fn:
            from nfs_tpu.render.transfer import resolve_transfer
            self.tf_nodes = jnp.asarray(resolve_transfer(rc.transfer_fn))

        # Poisson-disk camera pool, device-resident (SURVEY.md §7 design
        # stance: host Bridson -> device pool indexed inside jit).
        if rc.sample_type == "poisson":
            self.view_pool = jnp.asarray(poisson_view_pool(
                rc.view_pool, rc.n_views, (rc.theta0, rc.theta1),
                (rc.phi0, rc.phi1), seed=cfg.seed))
        else:
            self.view_pool = None

        # jit-cache-stable loss closures (keyed by structural signature)
        # and a single optimizer instance (stable identity across frames).
        self._loss_cache: Dict[Tuple, object] = {}
        self._optimizer = optax.adam(cfg.optim.lr, b1=cfg.optim.b1,
                                     b2=cfg.optim.b2)
        # stable second optimizer for warm-started frames (optim.warm_lr)
        oc = cfg.optim
        self._warm_optimizer = (
            optax.adam(oc.warm_lr, b1=oc.b1, b2=oc.b2)
            if oc.warm_lr is not None else self._optimizer)

    # ---------------------------------------------------------------- #
    # loss pipeline (pure functions of (opt_var, key, data))
    # ---------------------------------------------------------------- #

    def _sample_views(self, key: jax.Array, pool) -> jax.Array:
        rc = self.cfg.render
        if pool is not None:
            idx = jax.random.randint(key, (), 0, pool.shape[0])
            return pool[idx]
        return sample_views_stratified(
            key, rc.n_views, (rc.theta0, rc.theta1), (rc.phi0, rc.phi1))

    def _render(self, d_star: jax.Array, key: jax.Array, pool,
                render_size=None, tf_nodes=None) -> jax.Array:
        """d* -> (N, H, W, 3) images for the CNN. tf_nodes overrides the
        styler's static transfer function (render.train_transfer threads
        the TRAINED control points through here)."""
        rc = self.cfg.render
        render_size = render_size or rc.render_size
        tf = self.tf_nodes if tf_nodes is None else tf_nodes
        if d_star.ndim == 2:
            return render2d(d_star, out_size=render_size, gamma=rc.gamma,
                            tf_nodes=tf,
                            tf_max=rc.tf_max_density)[None]
        views = self._sample_views(key, pool)
        return render_views(d_star, views[:, 0], views[:, 1],
                            transmit=rc.transmit, out_size=render_size,
                            gamma=rc.gamma, method=rc.rotation,
                            tf_nodes=tf,
                            tf_max=rc.tf_max_density)

    def _render_loss(self, d_star, key, pool, render_size, data,
                     tf_nodes=None):
        """Render views of d_star and evaluate the image loss; with
        loss.remat_views, views are evaluated sequentially under
        jax.checkpoint (peak memory / n_views, recompute in bwd)."""
        lc = self.cfg.loss
        rc = self.cfg.render
        tf = self.tf_nodes if tf_nodes is None else tf_nodes
        if d_star.ndim == 2 or not lc.remat_views:
            return self._image_loss(
                self._render(d_star, key, pool, render_size,
                             tf_nodes=tf), data)

        from nfs_tpu.render.raymarch import render_volume

        views = self._sample_views(key, pool)

        def one_view(v):
            img = render_volume(d_star, v[0], v[1], transmit=rc.transmit,
                                out_size=render_size, gamma=rc.gamma,
                                method=rc.rotation, tf_nodes=tf,
                                tf_max=rc.tf_max_density)
            if tf is None:
                img = jnp.repeat(img[..., None], 3, axis=-1)
            return self._image_loss(img[None], data)

        losses = jax.lax.map(jax.checkpoint(one_view), views)
        return jnp.mean(losses)

    def _apply_param(self, opt_var, d_base: jax.Array) -> jax.Array:
        if isinstance(opt_var, dict):  # render.train_transfer pytree
            opt_var = opt_var["field"]
        if self.cfg.optim.parameterization == "velocity":
            return advect(d_base, opt_var,
                          max_disp=self.cfg.optim.param_max_disp,
                          impl=self.cfg.optim.advect_impl)
        return d_base + opt_var

    def _image_loss_weighted(self, imgs: jax.Array, pos_weights,
                             data) -> jax.Array:
        """Window-batched image loss: imgs (P, V, H, W, 3) holds every
        window position's views, pushed through VGG in ONE batched call
        (P*V images) instead of P sequential render->VGG passes — bigger
        conv batches for the MXU and one fused backward. Returns
        sum_p pos_weights[p] * image_loss(imgs[p]) exactly (Gram MSEs are
        computed per image, then averaged per position)."""
        lc = self.cfg.loss
        P, V = imgs.shape[0], imgs.shape[1]
        flat = imgs.reshape((P * V,) + imgs.shape[2:])
        layers = set()
        if data["targets"] is not None:
            layers |= set(lc.style_layers)
        if lc.content_layer:
            layers.add(lc.content_layer)
        dtype = jnp.bfloat16 if lc.features_dtype == "bfloat16" else None
        feats = vgg_features(data["vgg"], flat, tuple(sorted(layers)),
                             pool=lc.pool, dtype=dtype)
        pos_weights = jnp.asarray(pos_weights, jnp.float32)
        total = jnp.float32(0.0)
        if data["targets"] is not None and lc.w_style:
            from nfs_tpu.features.losses import gram_matrix

            for layer, lw in zip(lc.style_layers, lc.style_layer_weights):
                g = gram_matrix(feats[layer])                  # (P*V,C,C)
                gt = data["targets"][layer].astype(jnp.float32)
                mse = jnp.mean((g - gt) ** 2, axis=(-2, -1))   # (P*V,)
                per_pos = jnp.mean(mse.reshape(P, V), axis=1)
                total += lc.w_style * lw * jnp.sum(pos_weights * per_pos)
        if lc.content_layer and lc.w_content:
            f = feats[lc.content_layer].astype(jnp.float32)
            if data["content"] is not None:
                ft = data["content"][lc.content_layer].astype(jnp.float32)
                mse = jnp.mean((f - ft) ** 2,
                               axis=tuple(range(1, f.ndim)))
            else:
                ch = (f if lc.content_channel is None
                      else f[..., lc.content_channel])
                mse = -jnp.mean(ch, axis=tuple(range(1, ch.ndim)))
            per_pos = jnp.mean(mse.reshape(P, V), axis=1)
            total += lc.w_content * jnp.sum(pos_weights * per_pos)
        return total

    def _image_loss(self, imgs: jax.Array, data) -> jax.Array:
        lc = self.cfg.loss
        layers = set()
        if data["targets"] is not None:
            layers |= set(lc.style_layers)
        if lc.content_layer:
            layers.add(lc.content_layer)
        dtype = jnp.bfloat16 if lc.features_dtype == "bfloat16" else None
        feats = vgg_features(data["vgg"], imgs, tuple(sorted(layers)),
                             pool=lc.pool, dtype=dtype)
        total = jnp.float32(0.0)
        if data["targets"] is not None and lc.w_style:
            total += lc.w_style * style_loss(
                feats, data["targets"], lc.style_layers,
                lc.style_layer_weights)
        if lc.content_layer and lc.w_content:
            if data["content"] is not None:
                total += lc.w_content * content_loss(
                    feats, data["content"], lc.content_layer)
            else:
                total += lc.w_content * semantic_loss(
                    feats, lc.content_layer, lc.content_channel)
        return total

    def _frame_key(self, key: jax.Array, abs_t: int) -> jax.Array:
        """Per-frame PRNG key: absolute-frame fold_in (resume-stable), or
        the sequence key verbatim when render.fixed_view_schedule — every
        frame then draws the identical per-iteration view schedule,
        removing view-sampling jitter from frame-to-frame drift."""
        if self.cfg.render.fixed_view_schedule:
            return key
        return jax.random.fold_in(key, abs_t)

    def _window_weights(self, window: int) -> jax.Array:
        oc = self.cfg.optim
        j = jnp.arange(-window, window + 1, dtype=jnp.float32)
        w = jnp.exp(-0.5 * (j / max(oc.window_sigma, 1e-6)) ** 2)
        return w / jnp.sum(w)

    def _octave_render_size(self, octave_shape, full_shape):
        """Per-octave render resolution (render.scale_with_octave)."""
        rc = self.cfg.render
        if not rc.scale_with_octave or self.content_feats is not None:
            return rc.render_size
        factor = max(octave_shape[0] / full_shape[0],
                     octave_shape[-1] / full_shape[-1])
        return tuple(
            max(rc.min_render_size, int(round(s * factor / 8)) * 8)
            for s in rc.render_size)

    def _get_loss_fn(self, ndim: int, window: int, render_size=None):
        """Stable-identity loss closure per structural signature."""
        render_size = render_size or self.cfg.render.render_size
        sig = (ndim, window, tuple(render_size))
        if sig in self._loss_cache:
            return self._loss_cache[sig]

        cfg = self.cfg
        weights = self._window_weights(window) if window else None
        # render.train_transfer: opt_var is {'field', 'tf'} — the TF
        # control points are optimized jointly (clipped to [0,1]); the
        # hat-basis expansion (render/transfer.py) is differentiable in
        # its nodes. Works for single frames AND windowed sequences (the
        # trained tf renders every window position's transported state).
        train_tf = self._train_tf

        def loss_fn(opt_var, key, data):
            d_base = data["d"]
            pool = data["pool"]
            tf = (jnp.clip(opt_var["tf"], 0.0, 1.0) if train_tf
                  else None)
            d_star = self._apply_param(opt_var, d_base)
            if window == 0:
                total = self._render_loss(d_star, key, pool, render_size,
                                          data, tf_nodes=tf)
            else:
                vels = data["vels"]
                keys = jax.random.split(key, 2 * window + 1)
                # all 2W+1 window states (TNST §6: center + forward
                # transport through sim velocities + backward inverse)
                md = cfg.optim.max_disp
                impl = cfg.optim.advect_impl
                states = [None] * (2 * window + 1)
                states[window] = d_star
                d_j = d_star
                for j in range(1, window + 1):
                    d_j = advect(d_j, vels[window + j - 1], max_disp=md,
                                 impl=impl)
                    states[window + j] = d_j
                d_j = d_star
                for j in range(1, window + 1):
                    d_j = advect(d_j, -vels[window - j], max_disp=md,
                                 impl=impl)
                    states[window - j] = d_j
                if cfg.loss.remat_views and d_star.ndim == 3:
                    # memory-bound regime: keep the sequential per-view
                    # remat path
                    total = jnp.float32(0.0)
                    for p, s in enumerate(states):
                        total += weights[p] * self._render_loss(
                            s, keys[p], pool, render_size, data,
                            tf_nodes=tf)
                else:
                    # batched: every position's views through VGG in one
                    # call ((2W+1)*V conv batch on the MXU)
                    imgs = jnp.stack([
                        self._render(s, keys[p], pool, render_size,
                                     tf_nodes=tf)
                        for p, s in enumerate(states)])
                    total = self._image_loss_weighted(imgs, weights, data)
            if cfg.loss.w_tv:
                field = (opt_var["field"] if isinstance(opt_var, dict)
                         else opt_var)
                total += cfg.loss.w_tv * tv_loss(field, ndim=ndim)
            return total

        self._loss_cache[sig] = loss_fn
        return loss_fn

    def _get_seq_step(self, full_shape: Tuple[int, ...], window: int,
                      warm: bool = False):
        """Per-frame step for the fused sequence path: recursive-init
        advection + the complete coarse-to-fine octave optimization of one
        frame, as a pure jittable function of (param, t, key, dens, vels,
        data). Cached per (shape, window, warm) so every chunk reuses one
        executable. warm=True uses the optim.warm_iters/warm_lr schedule
        (the fused driver runs warm-started chain frames through it)."""
        sig = ("seq", tuple(full_shape), window, warm)
        if sig in self._loss_cache:
            return self._loss_cache[sig]

        cfg = self.cfg
        oc = cfg.optim
        n_iters = (oc.warm_iters if (warm and oc.warm_iters is not None)
                   else oc.iters)
        ndim = len(full_shape)
        shapes = octave_shapes(full_shape, oc.octave_n, oc.octave_scale)
        optimizer = self._warm_optimizer if warm else self._optimizer
        # closures built OUTSIDE the trace (they allocate weight constants;
        # building them inside step_fn leaks tracers into the cache)
        loss_fns = [
            self._get_loss_fn(ndim, window,
                              self._octave_render_size(s, full_shape))
            for s in shapes]

        def octave_sweep(param_t, d_full, vels_win, key, data):
            """Complete coarse-to-fine optimization of one frame. `data`
            is the TRACED constants dict (pool/vgg/targets/content) —
            threaded as arguments, never closed over, so executables stay
            constant-free and the jit cache hits across stylers
            (CLAUDE.md closure-identity rule)."""
            p = param_t
            losses_all = []
            for o, shape in enumerate(shapes):
                p = self._resize_param(p, shape)
                d_o = (resize(d_full, shape) if tuple(shape) != full_shape
                       else d_full)
                data_o = dict(data, d=d_o)
                if vels_win is not None:
                    if tuple(shape) != full_shape:
                        data_o["vels"] = jnp.stack([
                            resize(vels_win[j], shape, is_velocity=True)
                            for j in range(2 * window)])
                    else:
                        data_o["vels"] = vels_win
                loss_fn = loss_fns[o]
                opt_state = optimizer.init(p)
                keys = jax.random.split(jax.random.fold_in(key, o),
                                        n_iters)

                def istep(carry, k, _loss_fn=loss_fn, _data=data_o):
                    pp, ss = carry
                    loss, grads = jax.value_and_grad(_loss_fn)(pp, k, _data)
                    updates, ss = optimizer.update(grads, ss, pp)
                    pp = optax.apply_updates(pp, updates)
                    return (pp, ss), loss

                (p, _), losses = jax.lax.scan(istep, (p, opt_state), keys)
                losses_all.append(losses)

            p = self._resize_param(p, full_shape)
            d_star = jnp.maximum(self._apply_param(p, d_full), 0.0)
            return p, d_star, jnp.stack(losses_all)  # (octave_n, iters)

        def step_fn(param, t, key, dens, vels, data):
            d_full = dens[t]
            if vels is not None:
                # recursive init (TNST §6): transport the previous frame's
                # stylization forward — except at t=0, whose carry is
                # either zeros (fresh run) or a resume init_param that was
                # ALREADY transported by its true predecessor velocity
                # (prev_velocity); advecting it again by vels[0] here
                # would be the wrong transport.
                adv = self._advect_param(param, vels[jnp.maximum(t - 1, 0)])
                param_t = jax.tree.map(
                    lambda a, b: jnp.where(t > 0, a, b), adv, param)
            else:
                param_t = param
            vels_win = None
            if window and vels is not None:
                W = window
                T = vels.shape[0]
                idx = jnp.concatenate([
                    jnp.maximum(t - W + jnp.arange(W), 0),
                    jnp.minimum(t + jnp.arange(W), T - 1)])
                vels_win = jnp.take(vels, idx, axis=0)  # (2W, *sp, nd)
            return octave_sweep(param_t, d_full, vels_win, key, data)

        step_fn.octave_sweep = octave_sweep
        self._loss_cache[sig] = step_fn
        return step_fn

    def _get_seq_step_block(self, full_shape: Tuple[int, ...],
                            window: int, warm: bool = False):
        """Block-streamed per-frame step: dens holds one BLOCK of frames
        (indexed t_loc) and vels the block's velocity context, pre-padded
        with P = max(window, 1) halo frames on each side (edge frames
        replicated at the true sequence boundaries — matching the
        clamped indexing of the full-sequence step)."""
        sig = ("seq_block", tuple(full_shape), window, warm)
        if sig in self._loss_cache:
            return self._loss_cache[sig]
        oc = self.cfg.optim
        P = max(window, 1)
        octave_sweep = self._get_seq_step(full_shape, window,
                                          warm=warm).octave_sweep

        def step_fn(param, t_glob, t_loc, key, dens, vels, data):
            d_full = dens[t_loc]
            if vels is not None:
                param_t = self._advect_param(param, vels[P + t_loc - 1])
            else:
                param_t = param
            vels_win = None
            if window and vels is not None:
                vels_win = jax.lax.dynamic_slice_in_dim(
                    vels, t_loc + P - window, 2 * window, axis=0)
            del t_glob  # keys are pre-folded by absolute frame index
            return octave_sweep(param_t, d_full, vels_win, key, data)

        self._loss_cache[sig] = step_fn
        return step_fn

    # ---------------------------------------------------------------- #
    # public API
    # ---------------------------------------------------------------- #

    @property
    def _train_tf(self) -> bool:
        return bool(self.cfg.render.train_transfer
                    and self.tf_nodes is not None)

    def _wrap_tf_param(self, param):
        """Lift an array param into the {'field', 'tf'} pytree when
        render.train_transfer is on (no-op otherwise / when already a
        pytree). The tf nodes are COPIED: downstream scans donate param
        buffers, and jnp.asarray of a device array is a no-op — donating
        the styler's own tf_nodes would delete it."""
        if self._train_tf and not isinstance(param, dict):
            return {"field": param,
                    "tf": jnp.array(self.tf_nodes, jnp.float32, copy=True)}
        return param

    def init_param(self, shape: Tuple[int, ...]) -> jax.Array:
        if self.cfg.optim.parameterization == "velocity":
            return jnp.zeros(tuple(shape) + (len(shape),), jnp.float32)
        return jnp.zeros(tuple(shape), jnp.float32)

    def _advect_param(self, param, v: jax.Array):
        """Recursive warm-start transport (TNST §6): carry the previous
        frame's stylization param forward through the sim velocity.
        optim.param_advect selects semi-Lagrangian vs MacCormack/BFECC
        (second-order — the inherited pattern diffuses less per frame).
        Pytree params ({'field', 'tf'}): only the field lives on the grid
        and is transported; the tf control points are global trainables
        carried unchanged."""
        if isinstance(param, dict):
            return dict(param,
                        field=self._advect_param(param["field"], v))
        oc = self.cfg.optim
        if oc.param_advect == "maccormack":
            return advect_maccormack(param, v, max_disp=oc.max_disp)
        return advect(param, v, max_disp=oc.max_disp)

    def _resize_param(self, param, shape: Tuple[int, ...]):
        if isinstance(param, dict):  # render.train_transfer pytree:
            # only the field lives on the octave grid; tf nodes carry over
            return dict(param,
                        field=self._resize_param(param["field"], shape))
        if tuple(param.shape[:len(shape)]) == tuple(shape):
            return param
        is_vel = self.cfg.optim.parameterization == "velocity"
        return resize(param, shape, is_velocity=is_vel)

    def stylize_frame(self, d: np.ndarray,
                      vels: Optional[np.ndarray] = None,
                      init_param: Optional[jax.Array] = None,
                      key: Optional[jax.Array] = None,
                      callback=None,
                      checkpoint_path: Optional[str] = None,
                      warm: Optional[bool] = None):
        """Stylize one frame (or one temporal window around a frame).

        Args:
          d: (H, W) or (D, H, W) density (center frame).
          vels: optional (2W, *spatial, ndim) sim velocities for the window
            loss: vels[:W] are frames t-W..t-1 (backward transport uses
            their negation), vels[W:] are frames t..t+W-1 (forward).
          init_param: warm-start opt variable at FULL resolution (e.g. the
            previous frame's advected stylization, TNST §6 recursive init).
          checkpoint_path: if set, {param, Adam state} is checkpointed
            after every log_every-iteration chunk and the call RESUMES
            from an existing checkpoint at that path (SURVEY.md §5). The
            file is removed on successful completion.
          warm: use the optim.warm_iters/warm_lr schedule (fewer, smaller
            steps — warm starts re-converge fast and extra steps are
            temporal drift). None = auto: warm iff init_param is given.

        Returns:
          (d_star, param, info): stylized full-res density, final opt
          variable, dict with per-octave losses.
        """
        import os

        from nfs_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        cfg = self.cfg
        oc = cfg.optim
        warm = (init_param is not None) if warm is None else warm
        it_eff = (oc.warm_iters if (warm and oc.warm_iters is not None)
                  else oc.iters)
        opt_eff = self._warm_optimizer if warm else self._optimizer
        d_full = jnp.asarray(d, jnp.float32)
        full_shape = d_full.shape
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        window = oc.window if vels is not None else 0

        shapes = octave_shapes(full_shape, oc.octave_n, oc.octave_scale)
        param = (init_param if init_param is not None
                 else self.init_param(full_shape))
        train_tf = self._train_tf
        param = self._wrap_tf_param(param)
        info = {"octave_losses": []}

        # resume from an in-frame checkpoint
        start_octave, start_iter, restored_opt = 0, 0, None
        if checkpoint_path and os.path.exists(checkpoint_path):
            with np.load(checkpoint_path) as npz:
                import json
                meta = json.loads(bytes(npz["__meta__"]).decode())
            # the bit-exact-resume guarantee holds only if the PRNG
            # chunking (log_every), iteration budget, and octave ladder
            # are unchanged between runs — refuse loudly on a mismatch
            # instead of silently diverging from the uninterrupted run
            expect = {"log_every": oc.log_every, "iters": it_eff,
                      "shapes": [list(s) for s in shapes]}
            for k, want in expect.items():
                got = meta.get(k, want)  # old checkpoints: no guard
                if got != want:
                    raise ValueError(
                        f"in-frame checkpoint {checkpoint_path} was "
                        f"written with {k}={got} but this run uses "
                        f"{k}={want}; resuming would not bit-match an "
                        f"uninterrupted run. Restore the original flag "
                        f"or delete the checkpoint to restart the frame.")
            o = int(meta["octave"])
            p_like = self._wrap_tf_param(self.init_param(shapes[o]))
            like = {"param": p_like,
                    "opt_state": opt_eff.init(p_like)}
            state, _ = load_checkpoint(checkpoint_path, like)
            param = state["param"]
            restored_opt = state["opt_state"]
            start_octave, start_iter = o, int(meta["iters_done"])

        for o, shape in enumerate(shapes):
            if o < start_octave:
                continue
            param = self._resize_param(param, shape)
            d_o = resize(d_full, shape) if shape != full_shape else d_full
            data = {
                "d": d_o,
                "pool": self.view_pool,
                "vgg": self.vgg_params,
                "targets": self.gram_targets,
                "content": self.content_feats,
            }
            if window:
                vels_dev = jnp.asarray(vels, jnp.float32)
                if tuple(vels_dev.shape[1:-1]) != tuple(shape):
                    vels_dev = jnp.stack([
                        resize(v, shape, is_velocity=True)
                        for v in vels_dev])
                data["vels"] = vels_dev
            key, sub = jax.random.split(key)
            loss_fn = self._get_loss_fn(
                d_full.ndim, window,
                self._octave_render_size(shape, full_shape))

            state_cb = None
            if checkpoint_path:
                def state_cb(done, p, s, _o=o):
                    save_checkpoint(
                        checkpoint_path, {"param": p, "opt_state": s},
                        meta={"octave": _o, "iters_done": done,
                              "log_every": oc.log_every, "iters": it_eff,
                              "shapes": [list(s_) for s_ in shapes]})

            param, losses, _ = run_octave(
                param, loss_fn, data, sub, iters=it_eff, lr=oc.lr,
                b1=oc.b1, b2=oc.b2, log_every=oc.log_every,
                callback=(partial(callback, octave=o) if callback else None),
                optimizer=opt_eff,
                init_opt_state=(restored_opt if o == start_octave
                                else None),
                start_iter=(start_iter if o == start_octave else 0),
                state_callback=state_cb)
            restored_opt = None
            info["octave_losses"].append(losses)

        if checkpoint_path and os.path.exists(checkpoint_path):
            os.unlink(checkpoint_path)
        d_star = self._apply_param(param, d_full)
        d_star = jnp.maximum(d_star, 0.0)
        if train_tf:
            # the trained control points, ready for render CLI reuse /
            # export (render/transfer.py hat basis)
            info["tf_nodes"] = jnp.clip(param["tf"], 0.0, 1.0)
        return d_star, param, info

    def stylize_sequence(self, densities, velocities=None, key=None,
                         callback=None, fused: Optional[int] = None,
                         checkpoint_path: Optional[str] = None,
                         init_param: Optional[jax.Array] = None,
                         prev_velocity: Optional[jax.Array] = None,
                         frame_offset: int = 0):
        """Stylize a frame sequence with temporal coherence (TNST §6).

        Args:
          densities: (T, *spatial) array or list of per-frame densities.
          velocities: optional (T, *spatial, ndim) sim velocities
            (frame-to-frame, cells/frame); required for window > 0 and for
            recursive init.
          fused: frames per device dispatch. None reads
            ``optim.fused_frames``; 0/1-with-callback = streaming path
            (one dispatch per octave). With fused=F>0 and no callback/
            checkpointing, the complete multi-octave optimization of F
            frames runs as ONE jitted lax.scan (``_seq_chunk``) — no
            per-frame Python dispatch. The fused PRNG stream differs from
            the streaming path's, so the two modes give equally-valid but
            not bitwise-equal results.
          checkpoint_path: in-frame checkpointing (streaming path only):
            each frame's {param, Adam state} is checkpointed every
            log_every iterations and a restarted call RESUMES the
            interrupted frame mid-octave (styler/octave.py PRNG
            fast-forward keeps the resumed run bit-identical).
          init_param / prev_velocity / frame_offset: resume the recursive
            warm-start chain mid-sequence: `init_param` is the PREVIOUS
            (already completed) frame's final param, `prev_velocity` that
            frame's sim velocity (used to advect it forward), and
            `frame_offset` the absolute position of densities[0] in the
            original sequence. Per-frame PRNG keys are
            fold_in(key, frame_offset + t) — absolute-indexed, so a
            resumed run draws the same keys as an uninterrupted one.

        Yields (frame_index, d_star, param) per frame — streaming, so the
        caller can write each frame to disk as it completes (frame-granular
        idempotence, SURVEY.md §5). NOTE (fused path): the yielded carry
        `param` buffer is DONATED to the next chunk's dispatch — persist
        it (np.asarray / save) before resuming the generator; holding the
        device array across chunks raises "Array has been deleted".
        """
        cfg = self.cfg
        W = cfg.optim.window
        T = len(densities)
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        param = init_param
        # ONE bulk host->device upload; per-frame transfers over a remote
        # TPU tunnel cost ~an RTT each and dominated sequence time.
        densities = jnp.asarray(densities, jnp.float32)
        if velocities is not None:
            velocities = jnp.asarray(velocities, jnp.float32)

        fused = cfg.optim.fused_frames if fused is None else fused
        if (fused and fused > 1 and callback is None
                and checkpoint_path is None):
            yield from self._stylize_sequence_fused(
                densities, velocities, key, fused,
                init_param=init_param, prev_velocity=prev_velocity,
                frame_offset=frame_offset)
            return

        # NOTE: every frame handed in is stylized — frame selection
        # (stride, range) is the CALLER's job (the CLI builds the strided
        # frame list; striding again here stylized every N^2-th frame,
        # ADVICE r1 medium finding).
        for t in range(T):
            vels_win = None
            if W > 0 and velocities is not None:
                idx = [max(t - W + j, 0) for j in range(W)] + \
                      [min(t + j, T - 1) for j in range(W)]
                vels_win = jnp.stack([velocities[i] for i in idx])
            if param is not None:
                # recursive init: transport previous stylization forward
                # (for a mid-sequence resume, frame 0's predecessor
                # velocity comes in as prev_velocity)
                v_prev = None
                if t == 0 and prev_velocity is not None:
                    v_prev = jnp.asarray(prev_velocity, jnp.float32)
                elif t > 0 and velocities is not None:
                    v_prev = velocities[t - 1]
                if v_prev is not None:
                    param = self._advect_param(param, v_prev)
            # absolute-frame-indexed keys: a resumed run (frame_offset>0)
            # draws the exact keys the uninterrupted run drew
            sub = self._frame_key(key, frame_offset + t)
            d_star, param, _ = self.stylize_frame(
                densities[t], vels=vels_win, init_param=param,
                key=sub, callback=callback,
                checkpoint_path=checkpoint_path)
            yield t, d_star, param

    def stylize_sequence_blocks(self, blocks, key=None, fused: int = 8):
        """Block-STREAMED fused sequence stylization: frames arrive in
        host-memory blocks (e.g. read from per-chunk cache files), device
        memory holds only one block + working set, and because fused
        dispatches are async, host IO for block k+1 overlaps the device
        compute of block k. The PRNG stream (fold_in by absolute frame
        index) and the recursive-init carry match the non-blocked paths.

        Args:
          blocks: iterable of (t0, dens_block (B, *sp), vels_ctx) where
            vels_ctx is None (no temporal coupling) or a
            (B + 2P, *sp, nd) velocity CONTEXT covering global frames
            [t0 - P, t0 + B + P) with P = max(window, 1), edge frames
            replicated at the true sequence boundaries (see
            nfs_tpu.io.stream.iter_sequence_blocks).
          fused: frames per device dispatch within a block.

        Yields (t, d_star, param): param is the carry after each block's
        last frame (None mid-block), usable for checkpointed restarts.
        """
        cfg = self.cfg
        warm_set = (cfg.optim.warm_iters is not None
                    or cfg.optim.warm_lr is not None)
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        param = None
        step_fn = None
        B_std = None  # first block's size = the canonical executable shape
        for t0, dens_block, vels_ctx in blocks:
            dens_block = jnp.asarray(dens_block, jnp.float32)
            if vels_ctx is not None:
                vels_ctx = jnp.asarray(vels_ctx, jnp.float32)
            full_shape = tuple(dens_block.shape[1:])
            window = cfg.optim.window if vels_ctx is not None else 0
            skip = 0
            if param is None:
                param = self._wrap_tf_param(self.init_param(full_shape))
                if warm_set and t0 == 0:
                    # cold frame 0 via the streaming path; the chain
                    # frames below then run the warm executable
                    P0 = max(window, 1)
                    vels_win0 = (vels_ctx[P0 - window:P0 + window]
                                 if window else None)
                    d0, param, _ = self.stylize_frame(
                        dens_block[0], vels=vels_win0,
                        key=self._frame_key(key, 0), warm=False)
                    yield 0, d0, (param if dens_block.shape[0] == 1
                                  else None)
                    skip = 1
            if step_fn is None:
                step_fn = self._get_seq_step_block(full_shape, window,
                                                   warm=warm_set)
            data = {"pool": self.view_pool, "vgg": self.vgg_params,
                    "targets": self.gram_targets,
                    "content": self.content_feats}
            B = dens_block.shape[0]
            # pad a SMALLER final block up to the canonical block size by
            # repeating the last frame (extra entries never indexed: t_loc
            # is clipped to the real range and padded scan steps are
            # carry-masked) — otherwise the tail block's shape triggers a
            # second full compile of the multi-octave program
            if B_std is None:
                B_std = B
            elif B < B_std:
                pad = B_std - B
                dens_block = jnp.concatenate(
                    [dens_block, jnp.repeat(dens_block[-1:], pad, axis=0)])
                if vels_ctx is not None:
                    vels_ctx = jnp.concatenate(
                        [vels_ctx, jnp.repeat(vels_ctx[-1:], pad, axis=0)])
            chunk_std = min(fused, B_std)
            for c0 in range(skip, B, fused):
                n = min(fused, B - c0)
                nc = max(n, chunk_std)  # pad partial chunks, same reason
                t_glob = jnp.minimum(
                    jnp.arange(t0 + c0, t0 + c0 + nc, dtype=jnp.int32),
                    t0 + B - 1)
                t_loc = jnp.minimum(
                    jnp.arange(c0, c0 + nc, dtype=jnp.int32), B - 1)
                keys = jnp.stack([
                    self._frame_key(key, min(t, t0 + B - 1))
                    for t in range(t0 + c0, t0 + c0 + nc)])
                valid = jnp.arange(nc) < n
                param, d_stars, _ = _seq_chunk_block(
                    param, t_glob, t_loc, keys, valid, dens_block,
                    vels_ctx, data, step_fn=step_fn)
                last_in_block = c0 + n == B
                for i in range(n):
                    yield (t0 + c0 + i, d_stars[i],
                           param if (last_in_block and i == n - 1)
                           else None)

    def _stylize_sequence_fused(self, densities, velocities, key,
                                fused: int, init_param=None,
                                prev_velocity=None, frame_offset: int = 0):
        """Fused driver: chunks of `fused` frames, one dispatch each.

        Keys are fold_in(key, frame_offset + t) — absolute-frame-indexed
        like the streaming and block paths, so a resumed run draws the
        same keys as an uninterrupted one. A partial final chunk is
        PADDED to `fused` steps with carry-masked no-ops so it reuses the
        full-chunk executable (a tail recompile costs O(minutes) on a
        remote TPU; the padded steps cost (fused - n) wasted frame
        optimizations ONCE per sequence)."""
        T = densities.shape[0]
        full_shape = tuple(densities.shape[1:])
        oc = self.cfg.optim
        window = (oc.window if velocities is not None else 0)
        warm_set = oc.warm_iters is not None or oc.warm_lr is not None
        # chain frames (everything warm-started by the recursive init)
        # run the warm schedule; with a fresh start, frame 0 runs COLD
        # through the streaming single-frame path below
        step_fn = self._get_seq_step(full_shape, window, warm=warm_set)
        data = {
            "pool": self.view_pool,
            "vgg": self.vgg_params,
            "targets": self.gram_targets,
            "content": self.content_feats,
        }
        t_start = 0
        if init_param is not None:
            param = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                                 self._wrap_tf_param(init_param))
            if prev_velocity is not None:
                # transport the completed predecessor's stylization into
                # frame 0 (step_fn skips its own advection at t=0)
                param = self._advect_param(
                    param, jnp.asarray(prev_velocity, jnp.float32))
        else:
            param = self._wrap_tf_param(self.init_param(full_shape))
            if warm_set:
                W = window
                vels_win0 = None
                if W and velocities is not None:
                    idx = [0] * W + [min(j, T - 1) for j in range(W)]
                    vels_win0 = jnp.stack([velocities[i] for i in idx])
                d0, param, _ = self.stylize_frame(
                    densities[0], vels=vels_win0,
                    key=self._frame_key(key, frame_offset), warm=False)
                yield 0, d0, (param if T == 1 else None)
                if T == 1:
                    return
                t_start = 1
        for t0 in range(t_start, T, fused):
            n = min(fused, T - t0)
            # pad the tail chunk only when a full chunk was already
            # compiled; a short-sequence single chunk stays exact-sized
            nc = fused if (T - t_start) > fused else n
            t_idx = jnp.minimum(jnp.arange(t0, t0 + nc, dtype=jnp.int32),
                                T - 1)
            keys = jnp.stack([self._frame_key(key, frame_offset + t)
                              for t in range(t0, t0 + nc)])
            valid = jnp.arange(nc) < n
            param, d_stars, _ = _seq_chunk(
                param, t_idx, keys, valid, densities, velocities, data,
                step_fn=step_fn)
            for i in range(n):
                yield t0 + i, d_stars[i], (param if i == n - 1 else None)

"""LNST particle stylization engine (reference: ``styler_p.py``,
SURVEY.md §2/§3.4; LNST arXiv:2005.00803).

Optimization variables are per-particle attributes (LNST §4): position
offsets dx_i, density multipliers, and/or colors. The forward pipeline is
  splat(x + dx, dens) -> grid -> render (2D direct / 3D raymarch)
  -> VGG -> Gram/semantic losses,
with gradients flowing back through the differentiable splat to the
particle attributes (the position gradient comes through the smoothing
kernel, LNST §4.1 — see nfs_tpu/ops/splat.py).

Temporal coherence is Lagrangian and comes (almost) for free (LNST §5):
attributes are optimized at keyframes and linearly interpolated along
particle identity between keyframes (``interpolate_attrs``); particles
ride the simulation so the stylization is advected by construction.

Multi-scale: octaves shrink the SPLAT GRID resolution (positions rescale,
per-particle variables persist across octaves — no resampling needed,
a structural advantage of the Lagrangian parameterization).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nfs_tpu.core.config import StyleConfig
from nfs_tpu.core.pytrees import ParticleSet
from nfs_tpu.features.vgg import get_vgg_params, vgg_features
from nfs_tpu.features.losses import (
    semantic_loss,
    style_gram_targets,
    style_loss,
)
from nfs_tpu.io.image import load_image
from nfs_tpu.ops.resize import octave_shapes
from nfs_tpu.ops.splat import splat, splat_normalized
from nfs_tpu.render.camera import poisson_view_pool, sample_views_stratified
from nfs_tpu.render.raymarch import raymarch, render2d, render_views
from nfs_tpu.styler.octave import run_octave


class ParticleStyler:
    """Lagrangian (particle) stylizer for liquids/smoke (LNST)."""

    def __init__(self, cfg: StyleConfig, grid_shape: Tuple[int, ...],
                 vgg_params=None, style_image: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.grid_shape = tuple(grid_shape)
        self.vgg_params = (vgg_params if vgg_params is not None else
                           get_vgg_params(cfg.loss.vgg_weights,
                                          seed=cfg.seed))
        lc, rc = cfg.loss, cfg.render

        if style_image is None and lc.style_target:
            style_image = load_image(lc.style_target, size=rc.render_size)
        self.style_image = style_image
        self.gram_targets = None
        if style_image is not None:
            self.gram_targets = style_gram_targets(
                self.vgg_params, jnp.asarray(style_image),
                lc.style_layers, pool=lc.pool)

        if rc.sample_type == "poisson" and len(self.grid_shape) == 3:
            self.view_pool = jnp.asarray(poisson_view_pool(
                rc.view_pool, rc.n_views, (rc.theta0, rc.theta1),
                (rc.phi0, rc.phi1), seed=cfg.seed))
        else:
            self.view_pool = None

        self._loss_cache: Dict[Tuple, object] = {}
        self._optimizer = optax.adam(cfg.optim.lr, b1=cfg.optim.b1,
                                     b2=cfg.optim.b2)

    # ---------------------------------------------------------------- #

    def init_param(self, pset: ParticleSet) -> Dict[str, jax.Array]:
        pc = self.cfg.particle
        n, dim = pset.x.shape
        param = {}
        if pc.optimize_position:
            param["dx"] = jnp.zeros((n, dim), jnp.float32)
        if pc.optimize_density:
            param["ddens"] = jnp.zeros((n,), jnp.float32)
        if pc.optimize_color:
            init = (pset.color if pset.color is not None
                    else jnp.ones((n, 3), jnp.float32) * 0.5)
            param["color"] = jnp.asarray(init, jnp.float32)
        return param

    def _splat_grids(self, param, data, scale: float,
                     shape: Tuple[int, ...]):
        """Apply param -> (density grid, optional color grid) at octave
        resolution (positions scaled by `scale`)."""
        pc = self.cfg.particle
        x = data["x"]
        if "dx" in param:
            dx = pc.max_offset * jnp.tanh(param["dx"] / pc.max_offset)
            x = x + dx
        dens = data["dens"]
        if "ddens" in param:
            dens = dens * jnp.exp(param["ddens"])
        xs = x * scale
        d_grid = splat(xs, dens, shape, kernel=pc.kernel,
                       support=pc.support)
        # Resolution-independent brightness: a coarse cell collects
        # (1/scale)^dim of the full-res mass but covers (1/scale)^dim the
        # volume. Physical density = mass * scale^dim; the 3D raymarch
        # then steps 1/scale longer per cell, net scale^(dim-1) = scale^2
        # for dim=3 — and the 2D direct render needs mass/area = scale^2
        # as well. Both paths: multiply by scale^2.
        d_grid = d_grid * (scale ** 2)
        c_grid = None
        if "color" in param:
            c_grid = splat_normalized(xs, jnp.clip(param["color"], 0.0, 1.0),
                                      shape, kernel=pc.kernel,
                                      support=pc.support)
        return d_grid, c_grid

    def _render(self, d_grid, c_grid, key, pool):
        rc = self.cfg.render
        if d_grid.ndim == 2:
            return render2d(d_grid, out_size=rc.render_size, gamma=rc.gamma,
                            color=c_grid)[None]
        if pool is not None:
            idx = jax.random.randint(key, (), 0, pool.shape[0])
            views = pool[idx]
        else:
            views = sample_views_stratified(
                key, rc.n_views, (rc.theta0, rc.theta1), (rc.phi0, rc.phi1))
        if c_grid is None:
            return render_views(d_grid, views[:, 0], views[:, 1],
                                transmit=rc.transmit,
                                out_size=rc.render_size, gamma=rc.gamma,
                                method=rc.rotation)
        # color volume: rotate density and color together per view
        from nfs_tpu.render.raymarch import _rotate

        def one(t, p):
            dr = _rotate(d_grid, t, p, rc.rotation)
            cr = jnp.stack([_rotate(c_grid[..., c], t, p, rc.rotation)
                            for c in range(3)], axis=-1)
            return raymarch(dr, transmit=rc.transmit, axis=0,
                            out_size=rc.render_size, color=cr)

        return jax.vmap(one)(views[:, 0], views[:, 1])

    def _image_loss(self, imgs, data):
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
            total += lc.w_content * semantic_loss(
                feats, lc.content_layer, lc.content_channel)
        return total

    def _get_loss_fn(self, shape: Tuple[int, ...], scale: float):
        sig = (shape, round(scale, 6))
        if sig in self._loss_cache:
            return self._loss_cache[sig]

        def loss_fn(param, key, data):
            d_grid, c_grid = self._splat_grids(param, data, scale, shape)
            imgs = self._render(d_grid, c_grid, key, data["pool"])
            total = self._image_loss(imgs, data)
            if "dx" in param:
                # keep offsets small (LNST regularizes position changes)
                total += 1e-3 * jnp.mean(param["dx"] ** 2)
            return total

        self._loss_cache[sig] = loss_fn
        return loss_fn

    # ---------------------------------------------------------------- #

    def stylize_frame(self, pset: ParticleSet,
                      init_param: Optional[Dict] = None,
                      key: Optional[jax.Array] = None,
                      callback=None):
        """Optimize per-particle attributes for one (key)frame.

        Returns (stylized ParticleSet, param dict, info).
        """
        cfg = self.cfg
        oc = cfg.optim
        pc = cfg.particle
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)

        x = jnp.asarray(pset.x, jnp.float32)
        dens = (jnp.asarray(pset.dens, jnp.float32)
                if pset.dens is not None
                else jnp.ones((x.shape[0],), jnp.float32))
        param = init_param if init_param is not None else self.init_param(
            ParticleSet(x=x, dens=dens, color=pset.color))
        info = {"octave_losses": []}

        shapes = octave_shapes(self.grid_shape, oc.octave_n, oc.octave_scale)
        for o, shape in enumerate(shapes):
            scale = shape[0] / self.grid_shape[0]
            loss_fn = self._get_loss_fn(tuple(shape), scale)
            data = {
                "x": x,
                "dens": dens,
                "pool": self.view_pool,
                "vgg": self.vgg_params,
                "targets": self.gram_targets,
            }
            key, sub = jax.random.split(key)
            param, losses, _ = run_octave(
                param, loss_fn, data, sub, iters=oc.iters, lr=oc.lr,
                b1=oc.b1, b2=oc.b2, log_every=oc.log_every,
                callback=(partial(callback, octave=o) if callback else None),
                optimizer=self._optimizer)
            info["octave_losses"].append(losses)

        styled = self.apply_param(pset, param)
        return styled, param, info

    def apply_param(self, pset: ParticleSet, param: Dict) -> ParticleSet:
        pc = self.cfg.particle
        x = jnp.asarray(pset.x, jnp.float32)
        dens = (jnp.asarray(pset.dens, jnp.float32)
                if pset.dens is not None
                else jnp.ones((x.shape[0],), jnp.float32))
        if "dx" in param:
            x = x + pc.max_offset * jnp.tanh(param["dx"] / pc.max_offset)
        if "ddens" in param:
            dens = dens * jnp.exp(param["ddens"])
        color = param.get("color", pset.color)
        return ParticleSet(x=x, dens=dens, color=color, vel=pset.vel)

    def rasterize(self, pset: ParticleSet) -> jax.Array:
        """Splat a (stylized) particle set to the full-res density grid."""
        pc = self.cfg.particle
        dens = (pset.dens if pset.dens is not None
                else jnp.ones((pset.x.shape[0],), jnp.float32))
        return splat(jnp.asarray(pset.x, jnp.float32),
                     jnp.asarray(dens, jnp.float32), self.grid_shape,
                     kernel=pc.kernel, support=pc.support)

    def stylize_keyframes(self, psets, key=None, callback=None):
        """LNST §5 sequence flow: optimize at keyframes (stride from
        cfg.particle.keyframe_stride), interpolate attributes between.

        Args:
          psets: list of per-frame ParticleSet with STABLE particle
            identity (index i = same particle across frames).

        Yields (frame_index, stylized ParticleSet).
        """
        stride = self.cfg.particle.keyframe_stride
        T = len(psets)
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        keyframes = list(range(0, T, stride))
        if keyframes[-1] != T - 1:
            keyframes.append(T - 1)

        params = {}
        prev = None
        for kf in keyframes:
            key, sub = jax.random.split(key)
            _, p, _ = self.stylize_frame(psets[kf], init_param=prev,
                                         key=sub, callback=callback)
            params[kf] = p
            prev = jax.tree.map(jnp.copy, p)

        for t in range(T):
            k0 = max(k for k in keyframes if k <= t)
            k1 = min(k for k in keyframes if k >= t)
            if k0 == k1:
                p = params[k0]
            else:
                a = (t - k0) / (k1 - k0)
                p = jax.tree.map(lambda u, v: (1 - a) * u + a * v,
                                 params[k0], params[k1])
            yield t, self.apply_param(psets[t], p)


def interpolate_attrs(param0: Dict, param1: Dict, alpha: float) -> Dict:
    """Linear keyframe interpolation of per-particle attribute dicts."""
    return jax.tree.map(lambda a, b: (1 - alpha) * a + alpha * b,
                        param0, param1)

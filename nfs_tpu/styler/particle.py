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
    content_loss,
    semantic_loss,
    style_gram_targets,
    style_loss,
)
from nfs_tpu.io.image import load_image
from nfs_tpu.ops.resize import octave_shapes
from nfs_tpu.ops.splat import splat, splat_normalized
from nfs_tpu.ops.binsplat import (
    bin_particles,
    bucket_k,
    from_binned,
    max_bin_count,
    padded_shape,
    splat_binned,
    to_binned,
)
from nfs_tpu.render.camera import poisson_view_pool, sample_views_stratified
from nfs_tpu.render.raymarch import raymarch, render2d, render_views
from nfs_tpu.styler.octave import _scan_chunk_core, run_octave


def _to_hybrid(bn, n_slots, K, pshape, dims, n, tree):
    """Canonical (N, ...)-leaf pytree -> shifted-resident hybrid leaves
    {"b": dense bins in the Pallas shifted layout (K, Zp, Yb, Xb) or
    (C, K, Zp, Yb, Xb), "t": the untouched canonical (N, ...) tail}.

    The tail serves two roles: PARKED (overflow) particles live there
    authoritatively — the merge picks tail values for them, matching the
    slot layout's parking region — and active particles' stale tail
    copies are simply never read back."""
    from nfs_tpu.ops.pallas_binsplat import prep_shifted

    def conv(leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim in (1, 2)
                and leaf.shape[0] == n):
            return leaf
        b = to_binned(bn, leaf)              # (S+N,) or (C, S+N)
        if leaf.ndim == 1:
            d = prep_shifted(b[:n_slots].reshape((K,) + pshape), 0.0,
                             dims)
        else:
            d = jnp.stack([
                prep_shifted(b[c, :n_slots].reshape((K,) + pshape), 0.0,
                             dims) for c in range(leaf.shape[1])])
        return {"b": d, "t": leaf}

    return jax.tree.map(conv, tree)


def _from_hybrid(bn, n_slots, K, pshape, n, tree):
    """Exact inverse of `_to_hybrid` for every particle (parked ones
    resolve to the tail, active ones to their dense slot)."""
    def conv(leaf):
        if not (isinstance(leaf, dict) and set(leaf) == {"b", "t"}):
            return leaf
        d, t = leaf["b"], leaf["t"]
        sl = tuple(slice(2, 2 + s) for s in pshape)
        if t.ndim == 1:
            dense = d[(slice(None),) + sl].reshape(n_slots)
            return from_binned(bn, jnp.concatenate([dense, t]))
        dense = d[(slice(None), slice(None)) + sl].reshape(
            t.shape[1], n_slots)
        return from_binned(bn, jnp.concatenate([dense, t.T], axis=1))

    return jax.tree.map(
        conv, tree,
        is_leaf=lambda l: isinstance(l, dict) and set(l) == {"b", "t"})


def _binned_chunk_core(param, opt_state, keys, data, loss_fn, optimizer,
                       shape, K, scale, max_offset, has_dx,
                       kernel="bspline", layout="slots",
                       return_state=True):
    """One rebin + R optimizer iterations, all in a single dispatch.

    Bins at the chunk-start positions, permutes param AND Adam state into
    the dense (cells, K) layout (Adam is elementwise, so permuting its
    moments alongside the params is exact), scans R steps gather/scatter-
    free, and unsorts back to canonical particle order.

    layout='shifted' (the Pallas 3D-density path): the chunk state lives
    in the kernel's (K, Zp, Yb, Xb) shifted layout instead of flat slots,
    via `_to_hybrid`/`_from_hybrid`; `ops.pallas_binsplat.window_shifted`
    then consumes params and emits gradients with ZERO per-step
    pad/slice/reshape at the kernel boundary (~3 ms/iter of XLA layout
    plumbing at the particles_3d bench config, docs/LNST_TRACE.json, at
    the cost of ~37% more elementwise HBM traffic from the lane-padded
    dense region).

    Chunk-boundary permutations are the next cost (each scatter/gather
    row is ~1.2-1.5 ms on v5e; 16 rows in + 8 out at ~2 ms/iter
    amortized over a 20-iteration chunk), so two row-count levers:
    `opt_state=None` initializes the optimizer state directly IN the
    chunk layout (a fresh state needs no permutation — the default
    octave driver re-inits Adam per octave, so its first chunk always
    qualifies), and `return_state=False` skips permuting the state back
    (the last chunk's state is discarded). At the default one-chunk
    octave both engage: 16 of 24 permutation rows vanish.
    """
    x, dens = data["x"], data["dens"]
    n = x.shape[0]
    if has_dx:
        dx = max_offset * jnp.tanh(param["dx"] / max_offset)
        p = (x + dx) * scale
    else:
        p = x * scale
    bn = bin_particles(p, shape, K, kernel=kernel)
    n_slots = bn.valid.shape[0]

    if layout == "shifted":
        from nfs_tpu.ops.binsplat import padded_shape
        from nfs_tpu.ops.pallas_binsplat import (prep_shifted,
                                                 shifted_layout)
        pshape = padded_shape(shape)
        dims, _ = shifted_layout(shape)
        param_b = _to_hybrid(bn, n_slots, K, pshape, dims, n, param)
        state_b = (optimizer.init(param_b) if opt_state is None else
                   _to_hybrid(bn, n_slots, K, pshape, dims, n, opt_state))
        # chunk-constant operands: positions filled FAR outside the grid
        # at empty/pad slots (w1d == 0 there, so phantom slots contribute
        # exactly zero to values and gradients), attrs filled 0
        xb = to_binned(bn, x)
        densb = to_binned(bn, dens)
        xb4 = tuple(
            prep_shifted(
                jnp.where(bn.valid, xb[d, :n_slots], 1e4)
                .reshape((K,) + pshape), 1e4, dims)
            for d in range(x.shape[1]))
        densb4 = prep_shifted(densb[:n_slots].reshape((K,) + pshape),
                              0.0, dims)
        data_b = dict(data, xb4=xb4, densb4=densb4,
                      parked=bn.slot >= n_slots)

        def step(carry, key):
            pb, sb = carry
            loss, grads = jax.value_and_grad(loss_fn)(pb, key, data_b)
            updates, sb = optimizer.update(grads, sb, pb)
            pb = optax.apply_updates(pb, updates)
            return (pb, sb), loss

        (param_b, state_b), losses = jax.lax.scan(
            step, (param_b, state_b), keys)
        return (_from_hybrid(bn, n_slots, K, pshape, n, param_b),
                (_from_hybrid(bn, n_slots, K, pshape, n, state_b)
                 if return_state else None),
                losses, bn.n_overflow)

    def _to_b(tree):        # canonical (N, ...) leaves -> binned
        return jax.tree.map(
            lambda leaf: to_binned(bn, leaf)
            if (hasattr(leaf, "ndim") and leaf.ndim in (1, 2)
                and leaf.shape[0] == n) else leaf, tree)

    def _from_b(tree):      # binned (slot-minor) leaves -> canonical
        return jax.tree.map(
            lambda leaf: from_binned(bn, leaf)
            if (hasattr(leaf, "ndim") and leaf.ndim in (1, 2)
                and leaf.shape[-1] == n_slots + n) else leaf, tree)

    param_b = _to_b(param)
    state_b = (optimizer.init(param_b) if opt_state is None
               else _to_b(opt_state))
    data_b = dict(data, xb=to_binned(bn, x), densb=to_binned(bn, dens),
                  valid=bn.valid)

    def step(carry, key):
        pb, sb = carry
        loss, grads = jax.value_and_grad(loss_fn)(pb, key, data_b)
        updates, sb = optimizer.update(grads, sb, pb)
        pb = optax.apply_updates(pb, updates)
        return (pb, sb), loss

    (param_b, state_b), losses = jax.lax.scan(step, (param_b, state_b),
                                              keys)
    return (_from_b(param_b),
            _from_b(state_b) if return_state else None,
            losses, bn.n_overflow)


def _binned_chunk_keyed_core(param, opt_state, okey, data, loss_fn,
                             optimizer, shape, K, scale, max_offset,
                             has_dx, n_steps, kernel="bspline",
                             layout="slots", return_state=True):
    """`_binned_chunk_core` with the chunk's RNG plan derived ON DEVICE
    (same split sequence as the old eager version, so the PRNG stream —
    which parallel/particles.py mirrors bit-for-bit — is unchanged).
    Each eager `jax.random.split` costs a tunnel RTT on remote TPUs
    (measured ~4-8 ms apiece); deriving the per-iteration keys inside
    the chunk jit removes two of them per chunk."""
    okey_next, sub = jax.random.split(okey)
    keys = jax.random.split(sub, n_steps)
    param, opt_state, losses, n_over = _binned_chunk_core(
        param, opt_state, keys, data, loss_fn, optimizer, shape, K,
        scale, max_offset, has_dx, kernel=kernel, layout=layout,
        return_state=return_state)
    return param, opt_state, losses, n_over, okey_next


# the single-frame entry; parallel/particles.py vmaps
# `_binned_chunk_core` over a keyframe batch instead (one jit per
# engine, batch sharded over frames, keys pre-split per batch row)
_binned_chunk = jax.jit(
    _binned_chunk_keyed_core,
    static_argnames=("loss_fn", "optimizer", "shape", "K", "scale",
                     "max_offset", "has_dx", "n_steps", "kernel",
                     "layout", "return_state"),
    donate_argnums=(0, 1))


@jax.jit
def _split_pair(key):
    """`key, sub = jax.random.split(key)` as ONE device dispatch
    returning both halves (tuple output — indexing a (2, 2) split
    result costs one extra eager dispatch per half)."""
    ks = jax.random.split(key)
    return ks[0], ks[1]


def _dens_scale(ddens: jax.Array, max_log: Optional[float]) -> jax.Array:
    """Multiplicative density factor exp(ddens), optionally bounded to
    exp(+-max_log) via a smooth tanh limit (particle.max_log_dens) —
    an unbounded exp() under a hot Adam lr can blow densities up by
    orders of magnitude."""
    if max_log is None:
        return jnp.exp(ddens)
    return jnp.exp(max_log * jnp.tanh(ddens / max_log))


@partial(jax.jit, static_argnames=("shps", "base", "kernel"))
def _octave_max_counts(p, shps, base, kernel="bspline"):
    """Per-octave bin stats in one dispatch: row o = [max count,
    parked(1..16)] for octave shape o (module level so repeated
    stylize_frame calls reuse one traced executable — a per-call inner
    jit retraced + host-synced every frame). Column 0 is the legacy
    max-occupancy probe; the parked columns feed the K-budget selection
    (ParticleConfig.k_budget)."""
    from nfs_tpu.ops.binsplat import bin_count_stats
    return jnp.stack([bin_count_stats(p * (s[0] / base), s, kernel)
                      for s in shps])


class ParticleStyler:
    """Lagrangian (particle) stylizer for liquids/smoke (LNST)."""

    def __init__(self, cfg: StyleConfig, grid_shape: Tuple[int, ...],
                 vgg_params=None, style_image: Optional[np.ndarray] = None,
                 content_image: Optional[np.ndarray] = None):
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

        # content feature-matching target (parity with GridStyler,
        # VERDICT r3 missing #4): when a content image is given, the
        # content_layer objective is feature MSE against it instead of
        # the semantic (channel-activation) objective
        if content_image is None and lc.content_target:
            content_image = load_image(lc.content_target,
                                       size=rc.render_size)
        self.content_feats = None
        if content_image is not None and lc.content_layer:
            self.content_feats = vgg_features(
                self.vgg_params, jnp.asarray(content_image)[None],
                (lc.content_layer,), pool=lc.pool)

        # optional density -> RGB transfer function (colored rendering;
        # nfs_tpu/render/transfer.py). Per-particle color attributes take
        # precedence when optimize_color is on.
        self.tf_nodes = None
        if rc.transfer_fn:
            from nfs_tpu.render.transfer import resolve_transfer
            self.tf_nodes = jnp.asarray(resolve_transfer(rc.transfer_fn))

        if rc.sample_type == "poisson" and len(self.grid_shape) == 3:
            self.view_pool = jnp.asarray(poisson_view_pool(
                rc.view_pool, rc.n_views, (rc.theta0, rc.theta1),
                (rc.phi0, rc.phi1), seed=cfg.seed))
        else:
            self.view_pool = None

        self._loss_cache: Dict[Tuple, object] = {}
        # bin-capacity plans reused across frames (the occupancy probe
        # costs a dispatch + host sync per frame — ~40 ms over a remote
        # TPU tunnel); invalidated whenever a frame parks overflow
        # particles, so a drifting distribution re-probes next frame
        self._k_cache: Dict[Tuple, object] = {}
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
            dens = dens * _dens_scale(param["ddens"], pc.max_log_dens)
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

    def _octave_render_size(self, scale: float):
        """Per-octave render resolution (render.scale_with_octave) —
        coarse octaves render (and run VGG) at proportionally smaller
        sizes, the same lever that GridStyler uses (grid.py:186)."""
        rc = self.cfg.render
        # content features are computed once at the full render size, so
        # octave render scaling is off when they're present (matches
        # GridStyler._octave_render_size)
        if not rc.scale_with_octave or self.content_feats is not None:
            return rc.render_size
        return tuple(
            max(rc.min_render_size, int(round(s * scale / 8)) * 8)
            for s in rc.render_size)

    def _render(self, d_grid, c_grid, key, pool, render_size=None):
        rc = self.cfg.render
        render_size = render_size or rc.render_size
        tf = self.tf_nodes if c_grid is None else None
        if d_grid.ndim == 2:
            return render2d(d_grid, out_size=render_size, gamma=rc.gamma,
                            color=c_grid, tf_nodes=tf,
                            tf_max=rc.tf_max_density)[None]
        if pool is not None:
            idx = jax.random.randint(key, (), 0, pool.shape[0])
            views = pool[idx]
        else:
            views = sample_views_stratified(
                key, rc.n_views, (rc.theta0, rc.theta1), (rc.phi0, rc.phi1))
        if c_grid is None:
            return render_views(d_grid, views[:, 0], views[:, 1],
                                transmit=rc.transmit,
                                out_size=render_size, gamma=rc.gamma,
                                method=rc.rotation, tf_nodes=tf,
                                tf_max=rc.tf_max_density)
        # color volume: rotate density and color together per view
        from nfs_tpu.render.raymarch import _rotate

        def one(t, p):
            dr = _rotate(d_grid, t, p, rc.rotation)
            cr = jnp.stack([_rotate(c_grid[..., c], t, p, rc.rotation)
                            for c in range(3)], axis=-1)
            return raymarch(dr, transmit=rc.transmit, axis=0,
                            out_size=render_size, color=cr)

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
            if data.get("content") is not None:
                total += lc.w_content * content_loss(
                    feats, data["content"], lc.content_layer)
            else:
                total += lc.w_content * semantic_loss(
                    feats, lc.content_layer, lc.content_channel)
        return total

    def _get_loss_fn(self, shape: Tuple[int, ...], scale: float):
        rsize = self._octave_render_size(scale)
        sig = (shape, round(scale, 6), rsize)
        if sig in self._loss_cache:
            return self._loss_cache[sig]

        def loss_fn(param, key, data):
            d_grid, c_grid = self._splat_grids(param, data, scale, shape)
            imgs = self._render(d_grid, c_grid, key, data["pool"], rsize)
            total = self._image_loss(imgs, data)
            if "dx" in param:
                # keep offsets small (LNST regularizes position changes)
                total += 1e-3 * jnp.mean(param["dx"] ** 2)
            return total

        self._loss_cache[sig] = loss_fn
        return loss_fn

    def _get_binned_loss_fn(self, shape: Tuple[int, ...], scale: float,
                            K: int):
        """Loss over the dense binned layout (ops/binsplat.py). Matches
        `_get_loss_fn` semantics for kernel in ('bspline', 'linear') at
        support=1; density, color and the color-normalization denominator
        share ONE window pass (channels of the same splat)."""
        rsize = self._octave_render_size(scale)
        pc = self.cfg.particle
        sig = ("binned", pc.splat_impl, pc.kernel, shape, round(scale, 6),
               K, rsize)
        if sig in self._loss_cache:
            return self._loss_cache[sig]
        impl = pc.splat_impl
        if impl == "auto":  # fused Pallas kernels on TPU, XLA elsewhere
            impl = ("binned_pallas" if jax.default_backend() == "tpu"
                    else "binned")
        # the Pallas kernels implement the 27-tap bspline window only;
        # the 8-tap linear window is cheap enough that XLA's fusion wins
        use_pallas = (impl == "binned_pallas" and len(shape) == 3
                      and pc.kernel == "bspline")

        def _splat(pb, attr, valid):
            # fused Pallas VMEM window for the 3D single-channel case
            # (the hot LNST-3D config); the color path shares one
            # multi-channel XLA window pass (splitting it into per-channel
            # pallas calls would re-read the frac arrays per channel)
            if use_pallas and attr.ndim == 1:
                from nfs_tpu.ops.pallas_binsplat import splat_binned_pallas
                return splat_binned_pallas(pb, attr, valid, shape, K)
            return splat_binned(pb, attr, valid, shape, K,
                                kernel=pc.kernel)

        def loss_fn(param_b, key, data_b):
            # binned leaves are slot-minor: xb/dxb (dim, S), densb (S,),
            # color (3, S) — see ops/binsplat.py layout rule
            xb, densb, valid = data_b["xb"], data_b["densb"], data_b["valid"]
            if "dx" in param_b:
                dxb = pc.max_offset * jnp.tanh(param_b["dx"] / pc.max_offset)
                pb = (xb + dxb) * scale
            else:
                pb = xb * scale
            dens_eff = densb
            if "ddens" in param_b:
                dens_eff = densb * _dens_scale(param_b["ddens"],
                                               pc.max_log_dens)
            if "color" in param_b:
                colb = jnp.clip(param_b["color"], 0.0, 1.0)
                ones = jnp.ones_like(dens_eff)
                attr = jnp.concatenate(
                    [dens_eff[None], colb, ones[None]], axis=0)
                out = _splat(pb, attr, valid)
                d_grid = out[..., 0] * (scale ** 2)
                c_grid = out[..., 1:4] / (out[..., 4:5] + 1e-6)
            else:
                d_grid = _splat(pb, dens_eff, valid) * (scale ** 2)
                c_grid = None
            imgs = self._render(d_grid, c_grid, key, data_b["pool"], rsize)
            total = self._image_loss(imgs, data_b)
            if "dx" in param_b:
                # parked + dense slots hold every particle exactly once;
                # empty slots are zero — sum/N == canonical mean
                total += 1e-3 * jnp.sum(param_b["dx"] ** 2) / data_b["n_dx"]
            return total

        self._loss_cache[sig] = loss_fn
        return loss_fn

    def _get_shifted_loss_fn(self, shape: Tuple[int, ...], scale: float,
                             K: int):
        """Loss over the shifted-resident hybrid layout (see
        `_binned_chunk_core` layout='shifted'): params arrive as
        {"b": (C?, K, Zp, Yb, Xb), "t": (N, ...)} leaves, the window is
        `window_shifted` (operands and gradients stay in the kernel's
        layout), and the position regularizer counts every particle
        exactly once (dense slots + the parked tail, the active tail
        copies masked out)."""
        from nfs_tpu.ops.pallas_binsplat import (_interpret_default,
                                                 window_shifted)
        rsize = self._octave_render_size(scale)
        pc = self.cfg.particle
        interpret = _interpret_default()
        sig = ("shifted", shape, round(scale, 6), K, rsize, interpret)
        if sig in self._loss_cache:
            return self._loss_cache[sig]

        def loss_fn(param_b, key, data_b):
            xb4, densb4 = data_b["xb4"], data_b["densb4"]
            if "dx" in param_b:
                dxb = pc.max_offset * jnp.tanh(
                    param_b["dx"]["b"] / pc.max_offset)
                pb = tuple((xb4[d] + dxb[d]) * scale for d in range(3))
            else:
                pb = tuple(xb4[d] * scale for d in range(3))
            dens_eff = densb4
            if "ddens" in param_b:
                dens_eff = densb4 * _dens_scale(param_b["ddens"]["b"],
                                                pc.max_log_dens)
            d_grid = window_shifted(dens_eff, pb[0], pb[1], pb[2],
                                    shape, K, interpret) * (scale ** 2)
            imgs = self._render(d_grid, None, key, data_b["pool"], rsize)
            total = self._image_loss(imgs, data_b)
            if "dx" in param_b:
                t = jnp.where(data_b["parked"][:, None],
                              param_b["dx"]["t"], 0.0)
                total += 1e-3 * (jnp.sum(param_b["dx"]["b"] ** 2)
                                 + jnp.sum(t ** 2)) / data_b["n_dx"]
            return total

        self._loss_cache[sig] = loss_fn
        return loss_fn

    def _binned_parts(self, shape, scale, K, param_keys):
        """(loss_fn, layout) for the binned chunk: the shifted-resident
        layout when the fused Pallas window is eligible (3D, bspline,
        density-only attrs), flat slots otherwise. Both the single-frame
        octave driver and the keyframe-DP engine
        (parallel/particles.py) pick through here so their layouts stay
        in lockstep."""
        pc = self.cfg.particle
        impl = pc.splat_impl
        if impl == "auto":
            impl = ("binned_pallas" if jax.default_backend() == "tpu"
                    else "binned")
        if (pc.binned_layout != "slots" and impl == "binned_pallas"
                and len(shape) == 3 and pc.kernel == "bspline"
                and "color" not in param_keys):
            return (self._get_shifted_loss_fn(tuple(shape), scale, K),
                    "shifted")
        return self._get_binned_loss_fn(tuple(shape), scale, K), "slots"

    def _get_grid_loss_fn(self, shape: Tuple[int, ...], scale: float):
        """Loss for a GRID-space coarse octave (particle.coarse_mode
        'grid'): optimize a multiplicative log-density field g over the
        once-splatted octave density, d* = base_d * exp(g). For a field
        smooth at the octave's own resolution this matches modulating
        per-particle densities, splat(dens*exp(g(x))) ~ splat(dens)*exp(g),
        so g transfers to ddens by sampling at particle positions —
        while its iterations carry NO O(N) splat term at all."""
        rsize = self._octave_render_size(scale)
        sig = ("grid_coarse", shape, round(scale, 6), rsize)
        if sig in self._loss_cache:
            return self._loss_cache[sig]

        def loss_fn(g, key, data):
            d_grid = data["base_d"] * jnp.exp(g)
            imgs = self._render(d_grid, None, key, data["pool"], rsize)
            return self._image_loss(imgs, data)

        self._loss_cache[sig] = loss_fn
        return loss_fn

    def _grid_coarse_octave(self, param, data, key, shape, scale,
                            K=None, callback=None):
        """Run one coarse octave in grid space and fold the learned
        field into per-particle ddens (one splat + one trilinear
        sample per OCTAVE; zero per-iteration particle cost).

        With a bin capacity K the one-shot prep splat runs binned
        (sort + 4 row scatters + window kernel) instead of the flat
        27N-element scatter-add — measured 36 ms -> ~5 ms per coarse
        octave at 200k particles on v5e (the flat scatter was the
        single largest LNST-vs-TNST surcharge after rebinning)."""
        oc = self.cfg.optim
        shape = tuple(shape)
        pc = self.cfg.particle
        psig = ("grid_prep", shape, round(scale, 6), K,
                pc.splat_impl, pc.kernel)
        if psig not in self._loss_cache:
            from nfs_tpu.ops.interp import grid_sample

            use_pallas = (len(shape) == 3 and pc.kernel == "bspline"
                          and pc.splat_impl in ("auto", "binned_pallas")
                          and (pc.splat_impl == "binned_pallas"
                               or jax.default_backend() == "tpu"))

            def _prep(param, x, dens):
                if K is None:
                    base_d, _ = self._splat_grids(
                        param, {"x": x, "dens": dens}, scale, shape)
                    return base_d, jnp.zeros(shape, jnp.float32)
                if "dx" in param:
                    x = x + pc.max_offset * jnp.tanh(
                        param["dx"] / pc.max_offset)
                if "ddens" in param:
                    dens = dens * _dens_scale(param["ddens"],
                                              pc.max_log_dens)
                xs = x * scale
                bn = bin_particles(xs, shape, K, kernel=pc.kernel)
                pb = to_binned(bn, xs)
                db = to_binned(bn, dens)
                if use_pallas:
                    from nfs_tpu.ops.pallas_binsplat import (
                        splat_binned_pallas)
                    base_d = splat_binned_pallas(pb, db, bn.valid,
                                                 shape, K)
                else:
                    base_d = splat_binned(pb, db, bn.valid, shape, K,
                                          kernel=pc.kernel)
                return base_d * (scale ** 2), jnp.zeros(shape,
                                                        jnp.float32)

            def _xfer(param, g, x):
                if "dx" in param:
                    x = x + pc.max_offset * jnp.tanh(
                        param["dx"] / pc.max_offset)
                return dict(param, ddens=param["ddens"]
                            + grid_sample(g, x * scale))

            loss_fn = self._get_grid_loss_fn(shape, scale)

            def _fused(param, x, dens, gdata, key):
                # prep -> whole-octave scan -> xfer in ONE dispatch:
                # each extra dispatch over the remote-TPU tunnel costs
                # ~an RTT, and coarse octaves are dispatch-dominated.
                # The key plan runs on device too, preserving the exact
                # eager split sequence (octave split, then
                # split(split(okey)[1], iters)) that the keyframe-DP
                # engine mirrors bit-for-bit.
                ks = jax.random.split(key)
                key_next, okey = ks[0], ks[1]
                keys = jax.random.split(jax.random.split(okey)[1],
                                        oc.iters)
                base_d, g0 = _prep(param, x, dens)
                gdata = dict(gdata, base_d=base_d)
                g, _, losses = _scan_chunk_core(
                    g0, self._optimizer.init(g0), keys, gdata,
                    loss_fn, self._optimizer)
                return _xfer(param, g, x), losses, key_next

            self._loss_cache[psig] = (jax.jit(_prep), jax.jit(_xfer),
                                      jax.jit(_fused))
        prep, xfer, fused = self._loss_cache[psig]
        gdata = {"pool": data["pool"], "vgg": data["vgg"],
                 "targets": data["targets"],
                 "content": data.get("content")}
        if callback is None:
            return fused(param, data["x"], data["dens"], gdata, key)
        # observer path: separate dispatches so the callback can fire
        # between chunks (the fused single-dispatch path can't pause)
        key_next, okey = jax.random.split(key)
        base_d, g0 = prep(param, data["x"], data["dens"])
        loss_fn = self._get_grid_loss_fn(shape, scale)
        g, losses, _ = run_octave(
            g0, loss_fn, dict(gdata, base_d=base_d), okey, iters=oc.iters,
            lr=oc.lr, b1=oc.b1, b2=oc.b2, log_every=oc.log_every,
            callback=callback, optimizer=self._optimizer)
        return xfer(param, g, data["x"]), losses, key_next

    def _octave_ks(self, x, dx, shapes, kmaxes=None,
                   margin=0) -> Optional[list]:
        """Static bin capacities K for every octave in ONE device dispatch
        and ONE host sync (syncs over a remote-TPU tunnel cost ~an RTT
        each — per-octave syncs dominated the binned path's win). Returns
        None when the binned path shouldn't be used at all; per-octave
        entries are None where the slot budget is blown."""
        pc = self.cfg.particle
        if (pc.splat_impl not in ("auto", "binned", "binned_pallas")
                or pc.kernel not in ("bspline", "linear")
                or pc.support != 1.0):
            return None
        if kmaxes is None:
            p = x + dx if dx is not None else x
            kmaxes = np.asarray(_octave_max_counts(
                p, tuple(tuple(s) for s in shapes),
                float(self.grid_shape[0]), kernel=pc.kernel))
        kmaxes = np.asarray(kmaxes)
        if kmaxes.ndim == 1:   # legacy per-octave scalar maxes
            kmaxes = kmaxes[:, None]
        budget_n = (int(pc.k_budget * x.shape[0])
                    if pc.k_budget else 0)
        ks = []
        for stats, shape in zip(kmaxes, shapes):
            kmax = int(stats[0])
            # +1 headroom: within-chunk drift is <= ~lr*rebin_every cells
            # (<< 1), so crowding beyond the binned max is rare and the
            # parking region keeps any overflow exact (skipped until the
            # next rebin). Every extra K row is a full dense window pass,
            # so headroom is paid on every iteration. `margin` adds
            # cross-FRAME headroom when the caller caches the plan.
            need = int(kmax) + 1 + margin
            if budget_n >= 1 and len(stats) > 1:
                # K-budget: smallest K parking <= budget_n particles
                # (parked(k) in stats[1:]); headroom/margin deliberately
                # skipped — drift overflow lands in the SAME parking
                # budget, guarded by the 4x warning threshold
                parked = np.asarray(stats[1:])
                ok = np.nonzero(parked <= budget_n)[0]
                if ok.size:
                    need = min(need, int(ok[0]) + 1)
            K = bucket_k(need)
            if K < need:
                # true occupancy exceeds the bucket cap: the binned layout
                # would PERMANENTLY park (exclude) the overflow particles
                # for this octave — use the exact flat scatter instead
                ks.append(None)
                continue
            n_slots = int(np.prod(padded_shape(shape))) * K
            ks.append(K if n_slots <= pc.max_bin_slots else None)
        return ks

    def _run_binned_octave(self, param, data, okey, shape, scale, K,
                           callback=None):
        """Chunked octave driver for the binned path: one dispatch per
        `rebin_every` iterations (rebin + scan inside the jit, chunk
        keys derived inside — zero eager RNG ops); losses stay on
        device unless a callback forces a sync."""
        oc = self.cfg.optim
        pc = self.cfg.particle
        loss_fn, layout = self._binned_parts(tuple(shape), scale, K,
                                             tuple(param))
        has_dx = "dx" in param
        dims = (param["dx"].size if has_dx else 1)
        chunk_data = dict(data, n_dx=float(dims))
        # Adam state is fresh per octave: the first chunk initializes it
        # directly in the chunk layout (opt_state=None — no permutation
        # rows), and the last chunk skips permuting it back (discarded)
        opt_state = None
        chunk = max(1, pc.rebin_every)
        all_losses = []
        overflows = []
        done = 0
        while done < oc.iters:
            nst = min(chunk, oc.iters - done)
            param, opt_state, losses, n_over, okey = _binned_chunk(
                param, opt_state, okey, chunk_data, loss_fn=loss_fn,
                optimizer=self._optimizer, shape=tuple(shape), K=K,
                scale=scale, max_offset=pc.max_offset, has_dx=has_dx,
                n_steps=nst, kernel=pc.kernel, layout=layout,
                return_state=done + nst < oc.iters)
            done += nst
            all_losses.append(losses)
            overflows.append(n_over)  # stays on device until frame end
            if callback is not None:
                callback(done, float(jnp.mean(losses)))
        return param, jnp.concatenate(all_losses), jnp.max(jnp.stack(overflows))

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
        info = {"octave_losses": [], "octave_overflow": []}

        shapes = octave_shapes(self.grid_shape, oc.octave_n, oc.octave_scale)
        # grid-space coarse octaves (particle.coarse_mode): only the
        # FINEST octave runs the per-iteration particle splat, but the
        # coarse octaves' ONE-SHOT prep splat also runs binned when a
        # capacity fits, so every octave is probed (one fused dispatch)
        grid_coarse = pc.coarse_mode == "grid" and "ddens" in param
        if not (grid_coarse and len(shapes) > 1):
            grid_coarse = False
        ksig = (x.shape[0], tuple(tuple(s) for s in shapes), "dx" in param,
                pc.kernel, pc.splat_impl, pc.support)
        if ksig in self._k_cache:
            ks = self._k_cache[ksig]
        else:
            dx_now = None
            if "dx" in param:
                dx_now = pc.max_offset * jnp.tanh(
                    param["dx"] / pc.max_offset)
            # margin=2: the plan is reused across frames, so capacity
            # must survive cross-frame occupancy drift, not just
            # within-chunk drift. Only the finest octave pays per
            # iteration (coarse octaves splat once), so +2 K rows cost
            # ~(K+2)/K of one splat — negligible vs a 2-row overflow
            # parking particles for a whole frame.
            ks = self._octave_ks(x, dx_now, shapes, margin=2)
            self._k_cache[ksig] = ks
        for o, shape in enumerate(shapes):
            scale = shape[0] / self.grid_shape[0]
            data = {
                "x": x,
                "dens": dens,
                "pool": self.view_pool,
                "vgg": self.vgg_params,
                "targets": self.gram_targets,
                "content": self.content_feats,
            }
            cb = partial(callback, octave=o) if callback else None
            K = ks[o] if ks is not None else None
            # octave-level PRNG split sequence is unchanged; hot paths
            # run it on device (fused coarse: inside the jit; binned:
            # one jitted _split_pair dispatch) — eager splits cost a
            # tunnel RTT each on remote TPUs
            if grid_coarse and o < len(shapes) - 1:
                param, losses, key = self._grid_coarse_octave(
                    param, data, key, tuple(shape), scale, K=K,
                    callback=cb)
                n_over = jnp.int32(0)
            elif K is not None:
                key, okey = _split_pair(key)
                param, losses, n_over = self._run_binned_octave(
                    param, data, okey, tuple(shape), scale, K,
                    callback=cb)
            else:  # flat-scatter fallback (kernels other than
                   # bspline/linear, support != 1, huge K, or occupancy
                   # beyond the bucket cap)
                key, sub = jax.random.split(key)
                loss_fn = self._get_loss_fn(tuple(shape), scale)
                param, losses, _ = run_octave(
                    param, loss_fn, data, sub, iters=oc.iters, lr=oc.lr,
                    b1=oc.b1, b2=oc.b2, log_every=oc.log_every,
                    callback=cb, optimizer=self._optimizer)
                n_over = jnp.int32(0)
            info["octave_losses"].append(losses)
            info["octave_overflow"].append(n_over)

        # one scalar sync per frame: parked (overflow) particles are
        # excluded from the splat until the next rebin — a silently
        # crowded frame must be VISIBLE (VERDICT r2 weak #4). With a
        # K-budget, parking up to the budget is the DEAL, not a fault:
        # the warn/invalidate threshold is 4x the budget (drift
        # headroom); beyond it the distribution outgrew the plan.
        info["octave_overflow"] = [int(v) for v in
                                   np.asarray(jnp.stack(
                                       info["octave_overflow"]))]
        over_thresh = 4 * (int(pc.k_budget * x.shape[0])
                           if pc.k_budget else 0)
        if max(info["octave_overflow"]) > over_thresh:
            import warnings
            # drop the cached bin-capacity plan: the next frame re-probes
            # occupancy instead of reusing a capacity this frame outgrew
            self._k_cache.pop(ksig, None)
            warnings.warn(
                f"binned splat parked {max(info['octave_overflow'])} "
                f"overflow particles (per octave: "
                f"{info['octave_overflow']}); they were excluded from the "
                f"splat between rebins (the next frame re-probes bin "
                f"capacity). Consider particle.rebin_every lower or "
                f"splat_impl='flat'.", stacklevel=2)

        styled = self.apply_param(pset, param)
        return styled, param, info

    def apply_param(self, pset: ParticleSet, param: Dict) -> ParticleSet:
        """Apply an optimized attribute dict to a particle set — ONE
        jitted dispatch (the eager elementwise chain costs ~6 tunnel
        RTTs per frame, which dominates sequence interpolation)."""
        pc = self.cfg.particle
        x = jnp.asarray(pset.x, jnp.float32)
        dens = (jnp.asarray(pset.dens, jnp.float32)
                if pset.dens is not None else None)
        sig = ("apply", tuple(sorted(param)), dens is None)
        if sig not in self._loss_cache:
            mo, ml = pc.max_offset, pc.max_log_dens

            def _apply(x, dens, param):
                if dens is None:
                    dens = jnp.ones((x.shape[0],), jnp.float32)
                if "dx" in param:
                    x = x + mo * jnp.tanh(param["dx"] / mo)
                if "ddens" in param:
                    dens = dens * _dens_scale(param["ddens"], ml)
                return x, dens

            self._loss_cache[sig] = jax.jit(_apply)
        x, dens = self._loss_cache[sig](x, dens, param)
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
        T = len(psets)
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        keyframes = keyframe_indices(T, self.cfg.particle.keyframe_stride)

        params = {}
        prev = None
        self.last_keyframe_infos = {}
        for kf in keyframes:
            key, sub = jax.random.split(key)
            _, p, kf_info = self.stylize_frame(psets[kf], init_param=prev,
                                               key=sub, callback=callback)
            params[kf] = p
            self.last_keyframe_infos[kf] = kf_info
            prev = jax.tree.map(jnp.copy, p)

        yield from interp_sequence(psets, keyframes, params,
                                   float(self.cfg.particle.max_offset),
                                   apply_fn=self.apply_param,
                                   max_log_dens=self.cfg.particle
                                   .max_log_dens)


def interpolate_attrs(param0: Dict, param1: Dict, alpha: float) -> Dict:
    """Linear keyframe interpolation of per-particle attribute dicts."""
    return jax.tree.map(lambda a, b: (1 - alpha) * a + alpha * b,
                        param0, param1)


def keyframe_indices(T: int, stride: int):
    """Keyframe schedule: every `stride` frames plus the final frame."""
    kfs = list(range(0, T, max(1, stride)))
    if kfs[-1] != T - 1:
        kfs.append(T - 1)
    return kfs


def interp_sequence(psets, keyframes, params, max_offset, apply_fn,
                    max_log_dens=None):
    """Segment-batched keyframe interpolation: ONE jitted dispatch per
    keyframe segment (LNST §5 attribute interpolation along particle
    identity). The per-frame eager lerp + apply was ~8 remote dispatches
    per frame on the axon tunnel (~0.14 s/frame — larger than the
    amortized keyframe optimization itself at stride 10). Shared by the
    single-device and keyframe-parallel engines.

    Yields (t, stylized ParticleSet) for every frame index.
    """
    if len(keyframes) == 1:
        yield 0, apply_fn(psets[0], params[keyframes[0]])
        return
    for k0, k1 in zip(keyframes[:-1], keyframes[1:]):
        last = k1 == keyframes[-1]
        ts = list(range(k0, k1 + 1 if last else k1))
        alphas = jnp.asarray([(t - k0) / (k1 - k0) for t in ts],
                             jnp.float32)
        x = jnp.stack([jnp.asarray(psets[t].x, jnp.float32) for t in ts])
        n = x.shape[1]
        dens = jnp.stack([
            (jnp.asarray(psets[t].dens, jnp.float32)
             if psets[t].dens is not None
             else jnp.ones((n,), jnp.float32)) for t in ts])
        xo, do, co = _interp_apply_segment(
            params[k0], params[k1], alphas, x, dens, max_offset,
            max_log_dens)
        for i, t in enumerate(ts):
            color = co[i] if co is not None else psets[t].color
            yield t, ParticleSet(x=xo[i], dens=do[i], color=color,
                                 vel=psets[t].vel)


@partial(jax.jit, static_argnames=("max_offset", "max_log_dens"))
def _interp_apply_segment(p0: Dict, p1: Dict, alphas: jax.Array,
                          x: jax.Array, dens: jax.Array,
                          max_offset: float,
                          max_log_dens=None):
    """Fused keyframe-segment interpolation + attribute application.

    Lerps the two keyframe param dicts at every alpha and applies the
    result to the segment's stacked particle states in one XLA program
    (semantics identical to per-frame ``interpolate_attrs`` +
    ``ParticleStyler.apply_param``).

    Args:
      p0/p1: keyframe param dicts of (n, ...) arrays.
      alphas: (m,) interpolation weights for the segment's frames.
      x: (m, n, 3) per-frame particle positions.
      dens: (m, n) per-frame particle densities.

    Returns:
      (x*, dens*, color*) stacked over the segment; color* is None when
      the params carry no color attribute.
    """
    def lerp(u, v):
        a = alphas.reshape((-1,) + (1,) * u.ndim)
        return (1.0 - a) * u[None] + a * v[None]

    p = jax.tree.map(lerp, p0, p1)
    if "dx" in p:
        x = x + max_offset * jnp.tanh(p["dx"] / max_offset)
    if "ddens" in p:
        dens = dens * _dens_scale(p["ddens"], max_log_dens)
    return x, dens, p.get("color")

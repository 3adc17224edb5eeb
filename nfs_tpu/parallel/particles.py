"""Keyframe-parallel LNST over the ``frames`` mesh axis.

The reference's LNST flow (SURVEY.md §3.4, ``styler_p.py``) optimizes
keyframes one-by-one in a single process. Keyframes are embarrassingly
parallel once the sequential warm-start chain is dropped: the chain is a
convergence warm start, not the coherence mechanism — temporal coherence
comes from interpolating optimized attributes along particle identity
between keyframes (LNST §5), which is unaffected by how the keyframes
were computed.

TPU-native formulation: stack B keyframes on a leading batch axis,
shard that axis over a 1-D ``frames`` mesh, and run ONE program =
``vmap(_binned_chunk_core)`` under jit. Every device then optimizes its
local keyframes simultaneously — same binned gather/scatter-free splat,
same fused rebin+scan chunk — with the VGG weights, Gram targets and
camera pool replicated. There is no cross-keyframe term in the loss, so
the step needs NO collectives; GSPMD partitions the batch dimension and
the per-device program is identical to the single-frame one. Keyframe
counts that don't divide the mesh axis are padded with replicas of the
last keyframe (discarded on output).
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nfs_tpu.core.pytrees import ParticleSet
from nfs_tpu.ops.resize import octave_shapes
from nfs_tpu.parallel.mesh import make_mesh
from nfs_tpu.styler.octave import _scan_chunk_core
from nfs_tpu.styler.particle import (
    ParticleStyler,
    _binned_chunk_core,
    interp_sequence,
    keyframe_indices,
)


@jax.jit
def _split2(key_b: jax.Array):
    """Batched `key, sub = jax.random.split(key)` over (B, 2) keys —
    bit-identical per row to the single-device call, one dispatch."""
    ks = jax.vmap(jax.random.split)(key_b)
    return ks[:, 0], ks[:, 1]


@partial(jax.jit, static_argnames=("n",))
def _split_n(key_b: jax.Array, n: int):
    """Batched `jax.random.split(key, n)` -> (B, n, 2)."""
    return jax.vmap(lambda k: jax.random.split(k, n))(key_b)


@jax.jit
def _sample_fields_b(g_b: jax.Array, coords_b: jax.Array) -> jax.Array:
    """Batched per-keyframe trilinear field sample (grid-coarse ddens
    transfer): (B, *shape) fields at (B, N, dim) coords -> (B, N)."""
    from nfs_tpu.ops.interp import grid_sample
    return jax.vmap(grid_sample)(g_b, coords_b)


class ParallelKeyframeStyler:
    """Runs a ParticleStyler's keyframe optimization batched over a
    ``frames`` mesh axis (LNST data parallelism)."""

    def __init__(self, styler: ParticleStyler, mesh=None):
        self.styler = styler
        self.cfg = styler.cfg
        if mesh is None:
            mesh = make_mesh(frames=len(jax.devices()))
        if "frames" not in mesh.axis_names:
            raise ValueError(
                f"mesh must have a 'frames' axis, got {mesh.axis_names}")
        self.mesh = mesh
        self._chunk_cache = {}

    # ------------------------------------------------------------- #

    def _get_batched_chunk(self, shape, K, scale, param_keys,
                           first=False, last=False):
        """jit(vmap(_binned_chunk_core)) for one octave signature. The
        batch axis rides the arrays' shardings (GSPMD), so one traced
        executable serves any keyframe batch of the same shapes.

        first/last mirror the single-frame driver's permutation-row
        savings: the first chunk initializes Adam state inside the chunk
        layout (opt_state arg is None), the last skips permuting it
        back."""
        has_dx = "dx" in param_keys
        kernel = self.styler.cfg.particle.kernel
        sig = (shape, K, round(scale, 6), param_keys, kernel, first,
               last)
        if sig in self._chunk_cache:
            return self._chunk_cache[sig]
        styler = self.styler
        # same layout decision as the single-frame driver
        loss_fn, layout = styler._binned_parts(shape, scale, K,
                                               param_keys)
        core = partial(_binned_chunk_core, loss_fn=loss_fn,
                       optimizer=styler._optimizer, shape=shape, K=K,
                       scale=scale,
                       max_offset=styler.cfg.particle.max_offset,
                       has_dx=has_dx, kernel=kernel, layout=layout,
                       return_state=not last)
        data_axes = {"x": 0, "dens": 0, "pool": None, "vgg": None,
                     "targets": None, "content": None, "n_dx": None}
        fn = jax.jit(jax.vmap(core,
                              in_axes=(0, None if first else 0, 0,
                                       data_axes)),
                     donate_argnums=(0, 1))
        self._chunk_cache[sig] = fn
        return fn

    def _get_batched_grid_chunk(self, shape, scale):
        """jit(vmap(_scan_chunk_core)) for a GRID-space coarse octave
        (particle.coarse_mode 'grid'): each keyframe optimizes its own
        multiplicative log-density field over its once-splatted octave
        density; VGG/targets/pool replicated, base_d batched."""
        sig = ("grid", shape, round(scale, 6))
        if sig in self._chunk_cache:
            return self._chunk_cache[sig]
        styler = self.styler
        loss_fn = styler._get_grid_loss_fn(shape, scale)
        core = partial(_scan_chunk_core, loss_fn=loss_fn,
                       optimizer=styler._optimizer)
        data_axes = {"base_d": 0, "pool": None, "vgg": None,
                     "targets": None, "content": None}
        fn = jax.jit(jax.vmap(core, in_axes=(0, 0, 0, data_axes)),
                     donate_argnums=(0, 1))
        self._chunk_cache[sig] = fn
        return fn

    def _get_batched_splat(self, shape, scale):
        """One dispatch: splat every keyframe's current particles to its
        octave grid (the grid-coarse octave's base density)."""
        sig = ("splat", shape, round(scale, 6))
        if sig in self._chunk_cache:
            return self._chunk_cache[sig]
        styler = self.styler

        def one(param, x, dens):
            return styler._splat_grids(
                param, {"x": x, "dens": dens}, scale, shape)[0]

        fn = jax.jit(jax.vmap(one))
        self._chunk_cache[sig] = fn
        return fn

    def _shard(self, tree, batched: bool):
        spec = P("frames") if batched else P()
        sh = NamedSharding(self.mesh, spec)
        return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh),
                            tree)

    # ------------------------------------------------------------- #

    def stylize_keyframes(self, psets, key: Optional[jax.Array] = None):
        """Optimize all keyframes JOINTLY over the mesh, interpolate
        between (LNST §5). Falls back to the sequential single-device
        path when the binned layout doesn't apply (non-bspline kernels
        or occupancy beyond the slot budget).

        Yields (frame_index, stylized ParticleSet) like
        ``ParticleStyler.stylize_keyframes``. Per-keyframe PRNG streams
        are ``fold_in(key, keyframe_index)``, so results are invariant
        to the mesh shape AND to the number of keyframes optimized
        together.
        """
        styler = self.styler
        cfg = self.cfg
        oc, pc = cfg.optim, cfg.particle
        T = len(psets)
        base_key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        keyframes = keyframe_indices(T, pc.keyframe_stride)
        B = len(keyframes)

        xs = [jnp.asarray(psets[k].x, jnp.float32) for k in keyframes]
        n = xs[0].shape[0]
        if any(x.shape[0] != n for x in xs):
            raise ValueError("keyframe particle counts differ — stable "
                             "particle identity is required (LNST §5)")
        dens = [(jnp.asarray(psets[k].dens, jnp.float32)
                 if psets[k].dens is not None
                 else jnp.ones((n,), jnp.float32)) for k in keyframes]

        # common-K octave plan: every keyframe must fit the binned
        # layout; K is the max over keyframes so one program serves all.
        # With grid-space coarse octaves (particle.coarse_mode 'grid')
        # only the FINEST octave runs the particle splat, so only it is
        # probed / needs a bin capacity.
        shapes = octave_shapes(styler.grid_shape, oc.octave_n,
                               oc.octave_scale)
        grid_coarse = (pc.coarse_mode == "grid" and pc.optimize_density
                       and len(shapes) > 1)
        probe_shapes = shapes[-1:] if grid_coarse else shapes
        # batched K probe: one dispatch + one host sync for ALL keyframes
        # (the per-keyframe probe costs a tunnel RTT each)
        from nfs_tpu.styler.particle import _octave_max_counts
        shp_t = tuple(tuple(s) for s in probe_shapes)
        kmax_b = np.asarray(jax.vmap(
            lambda xx: _octave_max_counts(xx, shp_t,
                                          float(styler.grid_shape[0]),
                                          kernel=pc.kernel))(
            jnp.stack(xs)))
        per_kf_ks = [styler._octave_ks(xs[i], None, probe_shapes,
                                       kmaxes=kmax_b[i])
                     for i in range(B)]
        if any(ks is None or any(k is None for k in ks)
               for ks in per_kf_ks):
            warnings.warn(
                "keyframe-parallel LNST needs the binned splat layout "
                "on every particle-path octave; falling back to the "
                "sequential path", stacklevel=2)
            yield from styler.stylize_keyframes(psets, key=base_key)
            return

        shards = self.mesh.shape["frames"]
        pad = (-B) % shards
        Bp = B + pad

        def stack_pad(leaves):
            rows = list(leaves) + [leaves[-1]] * pad
            return jnp.stack(rows)

        x_b = self._shard(stack_pad(xs), batched=True)
        dens_b = self._shard(stack_pad(dens), batched=True)
        param = jax.tree.map(
            lambda *ls: jnp.stack(ls),
            *[styler.init_param(ParticleSet(x=xs[min(i, B - 1)],
                                            dens=dens[min(i, B - 1)],
                                            color=psets[keyframes[
                                                min(i, B - 1)]].color))
              for i in range(Bp)])
        param = self._shard(param, batched=True)
        key_b = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            base_key, jnp.asarray(
                [keyframes[min(i, B - 1)] for i in range(Bp)]))
        key_b = self._shard(key_b, batched=True)

        has_dx = "dx" in param
        dims = param["dx"][0].size if has_dx else 1
        rep = {"pool": styler.view_pool, "vgg": styler.vgg_params,
               "targets": styler.gram_targets,
               "content": styler.content_feats}
        rep = self._shard(rep, batched=False)

        # PRNG schedule mirrors the single-device path bit-for-bit (per
        # keyframe: fold_in(key, kf); per octave: key, sub = split(key);
        # per chunk: sub, s2 = split(sub); keys = split(s2, nst)), so
        # parallel results match B independent stylize_frame calls and
        # are invariant to the mesh shape.
        octave_losses, octave_over = [], []
        for o, shape in enumerate(shapes):
            scale = shape[0] / styler.grid_shape[0]
            key_b, okey_b = _split2(key_b)
            if grid_coarse and o < len(shapes) - 1:
                # grid-space coarse octave, batched: one splat per
                # keyframe to build the base density, then the whole
                # field optimization as one vmapped scan (mirrors
                # ParticleStyler._grid_coarse_octave chunk-for-chunk)
                base_d_b = self._get_batched_splat(tuple(shape), scale)(
                    param, x_b, dens_b)
                g_b = self._shard(
                    jnp.zeros((Bp,) + tuple(shape), jnp.float32),
                    batched=True)
                gstate = jax.jit(jax.vmap(styler._optimizer.init))(g_b)
                gdata = dict(rep, base_d=base_d_b)
                gstep = self._get_batched_grid_chunk(tuple(shape), scale)
                okey_b, s2_b = _split2(okey_b)
                g_b, gstate, ls = gstep(g_b, gstate,
                                        _split_n(s2_b, oc.iters), gdata)
                # fold the field into per-particle ddens (one batched
                # trilinear sample at particle positions)
                xx = x_b
                if has_dx:
                    xx = x_b + pc.max_offset * jnp.tanh(
                        param["dx"] / pc.max_offset)
                delta = _sample_fields_b(g_b, xx * scale)
                param = dict(param, ddens=param["ddens"] + delta)
                octave_losses.append(ls[:B])
                octave_over.append(jnp.zeros((B,), jnp.int32))
                continue
            K = max(ks[0 if grid_coarse else o] for ks in per_kf_ks)
            data = dict(rep, x=x_b, dens=dens_b, n_dx=float(dims))
            opt_state = None
            chunk = max(1, pc.rebin_every)
            done = 0
            losses = []
            overs = []
            while done < oc.iters:
                nst = min(chunk, oc.iters - done)
                step = self._get_batched_chunk(
                    tuple(shape), K, scale, tuple(sorted(param)),
                    first=opt_state is None,
                    last=done + nst >= oc.iters)
                okey_b, s2_b = _split2(okey_b)
                param, opt_state, ls, n_over = step(param, opt_state,
                                                    _split_n(s2_b, nst),
                                                    data)
                losses.append(ls)
                overs.append(n_over)
                done += nst
            octave_losses.append(jnp.concatenate(losses, axis=1)[:B])
            octave_over.append(jnp.stack(overs).max(axis=0)[:B])

        over = np.asarray(jnp.stack(octave_over))  # (octaves, B)
        over_thresh = 4 * (int(pc.k_budget * xs[0].shape[0])
                           if pc.k_budget else 0)
        if over.max() > over_thresh:
            warnings.warn(
                f"binned splat parked up to {int(over.max())} overflow "
                f"particles on some keyframes (per octave max over "
                f"keyframes: {over.max(axis=1).tolist()})", stacklevel=2)
        self.last_keyframe_infos = {
            kf: {"octave_losses": [octave_losses[o][i]
                                   for o in range(len(shapes))],
                 "octave_overflow": over[:, i].tolist()}
            for i, kf in enumerate(keyframes)}

        params = {kf: jax.tree.map(lambda a: a[i], param)
                  for i, kf in enumerate(keyframes)}
        yield from interp_sequence(psets, keyframes, params,
                                   float(pc.max_offset),
                                   apply_fn=styler.apply_param,
                                   max_log_dens=pc.max_log_dens)

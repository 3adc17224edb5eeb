"""Pallas TPU kernels for bounded-displacement (window) advection.

The XLA window formulation (nfs_tpu/ops/advect.py) already avoids
gathers, but every one of its (2K+1)^3 taps is a separate HBM-traffic
elementwise op (measured 2.7 ms fwd / 8.4 ms field-transpose for
112x64x112, K=3 on v5e). These kernels hold one z-slab of the (zero-
padded) field plus its +-K halo in VMEM and evaluate ALL taps from
on-chip memory — one HBM read per element instead of ~(2K+1)^3.

Layout notes (Pallas TPU):
  - all arrays are padded OUTSIDE the kernel: spatial dims to the tile
    grid (H to a multiple of 8, W to a multiple of 128) and the field
    additionally by K zeros on every side (so no boundary masking exists
    inside the kernel);
  - the padded field stays in ANY/HBM memory space; each grid step DMAs
    its halo'd slab into a VMEM scratch buffer (overlapping slabs cannot
    be expressed with plain BlockSpecs);
  - backtrace coordinates are passed as three separate (D, H, W) planes
    (sz, sy, sx) so every ref keeps a TPU-friendly 2D-tiled trailing
    layout.

Semantics match ``_advect_window`` exactly (same clamp + tent weights);
tests compare against it in interpret mode and on device.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tent(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _fwd_kernel(sz_ref, sy_ref, sx_ref, fpad_ref, out_ref, fslab, sem,
                *, K: int, tz: int):
    """out[z,y,x] = sum_o wz*wy*wx * fpad[z+oz, y+oy, x+ox]."""
    i = pl.program_id(0)
    # DMA the halo'd field slab: fpad rows [i*tz, i*tz + tz + 2K)
    cp = pltpu.make_async_copy(
        fpad_ref.at[pl.ds(i * tz, tz + 2 * K)], fslab, sem)
    cp.start()

    tz_, h, w = sz_ref.shape
    # global z index of each local row (Mosaic iota must be integer)
    z_global = (i * tz + jax.lax.broadcasted_iota(
        jnp.int32, (tz, h, w), 0)).astype(jnp.float32)
    sz = sz_ref[:]
    sy = sy_ref[:]
    sx = sx_ref[:]
    y_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 1).astype(
        jnp.float32)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 2).astype(
        jnp.float32)

    cp.wait()

    def z_tap(k, acc):
        # fori_loop over oz only: a fully unrolled (2K+1)^3 loop OOMs the
        # Mosaic scoped-VMEM stack, and dynamic slicing is only legal in
        # the (untiled) major dim — y/x offsets stay static slices.
        oz = k - K
        wz = _tent(sz - (z_global + oz.astype(jnp.float32)))
        f_z = fslab[pl.ds(k, tz), :, :]
        for oy in range(-K, K + 1):
            wzy = wz * _tent(sy - (y_idx + oy))
            for ox in range(-K, K + 1):
                wx = _tent(sx - (x_idx + ox))
                acc = acc + wzy * wx * f_z[:, oy + K:oy + K + h,
                                           ox + K:ox + K + w]
        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, 2 * K + 1, z_tap, jnp.zeros((tz_, h, w), jnp.float32))


@functools.lru_cache(maxsize=None)
def _fwd_call(K: int, tz: int, Dp: int, Hp: int, Wp: int,
              Hs: int, Ws: int):
    """Cached, vmappable forward pallas_call. sequential_vmap maps a
    batch dim with lax.map — Mosaic rejects the batched grid that plain
    vmap-of-pallas_call builds for the ANY-memory-space fpad operand
    (nontrivial index map), and serializing local frames costs nothing:
    each slab kernel already saturates the chip."""
    grid = (Dp // tz,)

    def call(sz, sy, sx, fpad):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, K=K, tz=tz),
            grid=grid,
            in_specs=[_block3(tz, Hp, Wp)] * 3 + [
                pl.BlockSpec(memory_space=pltpu.ANY)],  # fpad, manual DMA
            out_specs=_block3(tz, Hp, Wp),
            out_shape=jax.ShapeDtypeStruct((Dp, Hp, Wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tz + 2 * K, Hs, Ws), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(sz, sy, sx, fpad)

    return custom_batching.sequential_vmap(call)


@functools.partial(jax.jit, static_argnames=("max_disp", "tz"))
def pallas_window_advect(field: jax.Array, vel: jax.Array,
                         dt: float = 1.0, max_disp: float = 2.0,
                         tz: int = 8) -> jax.Array:
    """Forward window advection via the Pallas slab kernel (3D, clamp
    boundary). Numerically identical to
    ``advect(field, vel, dt, 'clamp', max_disp)``."""
    assert field.ndim == 3 and vel.shape == field.shape + (3,)
    D, H, W = field.shape
    K = int(math.ceil(max_disp)) + 1

    # backtrace coords, clamped (same as _advect_window clamp mode)
    disp = jnp.clip(dt * vel.astype(jnp.float32), -max_disp, max_disp)
    idx = [jax.lax.broadcasted_iota(jnp.float32, (D, H, W), a)
           for a in range(3)]
    s = [jnp.clip(idx[a] - disp[..., a], 0, field.shape[a] - 1)
         for a in range(3)]

    # pad to tile grid + field halo
    Dp = _round_up(D, tz)
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    pad_s = [(0, Dp - D), (0, Hp - H), (0, Wp - W)]
    sz, sy, sx = (jnp.pad(x, pad_s, constant_values=-10 * K) for x in s)
    # halo'd field, rounded up to tile-friendly trailing dims
    Hs = _round_up(Hp + 2 * K, 8)
    Ws = _round_up(Wp + 2 * K, 128)
    fpad = jnp.pad(field.astype(jnp.float32),
                   [(K, K + Dp - D), (K, Hs - H - K), (K, Ws - W - K)])

    out = _fwd_call(K, tz, Dp, Hp, Wp, Hs, Ws)(sz, sy, sx, fpad)
    return out[:D, :H, :W].astype(field.dtype)


def _bwd_field_kernel(stack_ref, out_ref, slab, sem, *, K: int, tz: int):
    """Transpose: grad_f[j] = sum_o tent(s[j+o] - j) * g[j+o].

    The weights are evaluated at the SHIFTED location j+o, so the s planes
    need halos exactly like the data; ``stack_ref`` (ANY/HBM) holds the
    halo'd stack of (sz, sy, sx, g) on a leading axis of size 4 and each
    grid step DMAs its slab.
    """
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        stack_ref.at[:, pl.ds(i * tz, tz + 2 * K)], slab, sem)
    cp.start()

    tz_ = tz
    _, _, hs, ws = slab.shape
    h = out_ref.shape[1]
    w = out_ref.shape[2]
    z_idx = (i * tz + jax.lax.broadcasted_iota(
        jnp.int32, (tz, h, w), 0)).astype(jnp.float32)
    y_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 1).astype(
        jnp.float32)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 2).astype(
        jnp.float32)
    cp.wait()

    def z_tap(k, acc):
        sub = slab[:, pl.ds(k, tz), :, :]  # (4, tz, hs, ws) at i = j + oz
        for oy in range(-K, K + 1):
            for ox in range(-K, K + 1):
                szs = sub[0, :, oy + K:oy + K + h, ox + K:ox + K + w]
                sys_ = sub[1, :, oy + K:oy + K + h, ox + K:ox + K + w]
                sxs = sub[2, :, oy + K:oy + K + h, ox + K:ox + K + w]
                gs = sub[3, :, oy + K:oy + K + h, ox + K:ox + K + w]
                # weight argument is s_i - j  (j = this output cell)
                wgt = (_tent(szs - z_idx) * _tent(sys_ - y_idx)
                       * _tent(sxs - x_idx))
                acc = acc + wgt * gs
        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, 2 * K + 1, z_tap, jnp.zeros((tz_, h, w), jnp.float32))


def _dtent(u):
    """d/du max(0, 1-|u|), matching JAX's subgradient conventions exactly:
    abs'(0) = +1 (lax.abs JVP selects the x>=0 branch) and max' at the
    tie |u|=1 averages the branches (0.5). Matters in practice: a
    zero-initialized stylization velocity gives u == 0 at EVERY cell, and
    a 0-subgradient there would zero the first transport gradient."""
    sgn = jnp.where(u >= 0.0, 1.0, -1.0)
    au = jnp.abs(u)
    mag = jnp.where(au < 1.0, 1.0, jnp.where(au == 1.0, 0.5, 0.0))
    return -sgn * mag


def _bwd_vel_kernel(sz_ref, sy_ref, sx_ref, g_ref, fpad_ref,
                    gz_out, gy_out, gx_out, fslab, sem, *, K: int, tz: int):
    """grad_s[i] = g[i] * sum_o  d/ds[ wz*wy*wx ](s_i - (i+o)) * f[i+o],
    per component — same halo'd-field structure as the forward kernel."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        fpad_ref.at[pl.ds(i * tz, tz + 2 * K)], fslab, sem)
    cp.start()

    tz_, h, w = sz_ref.shape
    z_idx = (i * tz + jax.lax.broadcasted_iota(
        jnp.int32, (tz, h, w), 0)).astype(jnp.float32)
    y_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 1).astype(
        jnp.float32)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 2).astype(
        jnp.float32)
    sz = sz_ref[:]
    sy = sy_ref[:]
    sx = sx_ref[:]
    g = g_ref[:]
    cp.wait()

    def z_tap(k, accs):
        az, ay, ax = accs
        oz = (k - K).astype(jnp.float32)
        uz = sz - (z_idx + oz)
        wz, dz = _tent(uz), _dtent(uz)
        f_z = fslab[pl.ds(k, tz), :, :]
        for oy in range(-K, K + 1):
            uy = sy - (y_idx + oy)
            wy, dy = _tent(uy), _dtent(uy)
            for ox in range(-K, K + 1):
                ux = sx - (x_idx + ox)
                wx, dx = _tent(ux), _dtent(ux)
                f = f_z[:, oy + K:oy + K + h, ox + K:ox + K + w]
                az = az + dz * wy * wx * f
                ay = ay + wz * dy * wx * f
                ax = ax + wz * wy * dx * f
        return az, ay, ax

    zero = jnp.zeros((tz_, h, w), jnp.float32)
    az, ay, ax = jax.lax.fori_loop(0, 2 * K + 1, z_tap, (zero, zero, zero))
    gz_out[:] = az * g
    gy_out[:] = ay * g
    gx_out[:] = ax * g


def _pad_hw(x, Hp, Wp, value=0.0):
    D, H, W = x.shape
    return jnp.pad(x, [(0, 0), (0, Hp - H), (0, Wp - W)],
                   constant_values=value)


def _prep(field, vel, dt, max_disp, tz):
    """Shared preprocessing: clamped backtrace coords + tile padding."""
    D, H, W = field.shape
    K = int(math.ceil(max_disp)) + 1
    disp = jnp.clip(dt * vel.astype(jnp.float32), -max_disp, max_disp)
    idx = [jax.lax.broadcasted_iota(jnp.float32, (D, H, W), a)
           for a in range(3)]
    s = [jnp.clip(idx[a] - disp[..., a], 0, field.shape[a] - 1)
         for a in range(3)]
    Dp = _round_up(D, tz)
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    Hs = _round_up(Hp + 2 * K, 8)
    Ws = _round_up(Wp + 2 * K, 128)
    dims = (D, H, W, Dp, Hp, Wp, Hs, Ws, K)
    return s, disp, dims


def _block3(tz, Hp, Wp):
    return pl.BlockSpec((tz, Hp, Wp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _bwd_field_call(K: int, tz: int, Dp: int, Hp: int, Wp: int,
                    Hs: int, Ws: int):
    """Cached, vmappable grad-wrt-field pallas_call (see _fwd_call)."""
    grid = (Dp // tz,)

    def call(stack):
        return pl.pallas_call(
            functools.partial(_bwd_field_kernel, K=K, tz=tz),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=_block3(tz, Hp, Wp),
            out_shape=jax.ShapeDtypeStruct((Dp, Hp, Wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((4, tz + 2 * K, Hs, Ws), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(stack)

    return custom_batching.sequential_vmap(call)


def _bwd_fused_kernel(stack_ref, gf_out, gz_out, gy_out, gx_out,
                      slab, sem, *, K: int, tz: int):
    """Fused backward: ALL four gradients in one pass over one halo'd
    slab (ROADMAP #6 / VERDICT r4 next #7).

    ``stack_ref`` (ANY/HBM) holds five K-halo'd planes on a leading axis:
    [sz, sy, sx, g, f]. Per z-slab ONE DMA brings the halo'd slab into
    VMEM, and the single (2K+1)^3 tap loop accumulates

      grad_f[j]   = sum_o tent(s[j+o] - j) * g[j+o]          (pull, planes 0-3)
      grad_s[j]   = g[j] * sum_o d/ds[prod tent](s_j - (j+o)) * f[j+o]
                                                              (push, plane 4)

    vs the split kernels this halves slab DMA traffic (sz/sy/sx/g were
    fetched by BOTH kernels), drops one dispatch, and replaces nine XLA
    pad ops with one stacked pad (see _advect_pallas_bwd).
    """
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        stack_ref.at[:, pl.ds(i * tz, tz + 2 * K)], slab, sem)
    cp.start()

    h = gf_out.shape[1]
    w = gf_out.shape[2]
    z_idx = (i * tz + jax.lax.broadcasted_iota(
        jnp.int32, (tz, h, w), 0)).astype(jnp.float32)
    y_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 1).astype(
        jnp.float32)
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (tz, h, w), 2).astype(
        jnp.float32)
    cp.wait()

    # center (unshifted) views: output row z maps to slab row z-local + K
    sz_c = slab[0, pl.ds(K, tz), K:K + h, K:K + w]
    sy_c = slab[1, pl.ds(K, tz), K:K + h, K:K + w]
    sx_c = slab[2, pl.ds(K, tz), K:K + h, K:K + w]
    g_c = slab[3, pl.ds(K, tz), K:K + h, K:K + w]

    def z_tap(k, accs):
        af, az, ay, ax = accs
        oz = (k - K).astype(jnp.float32)
        sub = slab[:, pl.ds(k, tz), :, :]
        # push weights share one z factor per k
        uz = sz_c - (z_idx + oz)
        wz_c, dz_c = _tent(uz), _dtent(uz)
        for oy in range(-K, K + 1):
            uy = sy_c - (y_idx + oy)
            wy_c, dy_c = _tent(uy), _dtent(uy)
            for ox in range(-K, K + 1):
                # --- pull leg: grad_field from shifted (s, g)
                szs = sub[0, :, oy + K:oy + K + h, ox + K:ox + K + w]
                sys_ = sub[1, :, oy + K:oy + K + h, ox + K:ox + K + w]
                sxs = sub[2, :, oy + K:oy + K + h, ox + K:ox + K + w]
                gs = sub[3, :, oy + K:oy + K + h, ox + K:ox + K + w]
                af = af + (_tent(szs - z_idx) * _tent(sys_ - y_idx)
                           * _tent(sxs - x_idx)) * gs
                # --- push leg: grad_s from shifted f, center weights
                ux = sx_c - (x_idx + ox)
                wx_c, dx_c = _tent(ux), _dtent(ux)
                f = sub[4, :, oy + K:oy + K + h, ox + K:ox + K + w]
                az = az + dz_c * wy_c * wx_c * f
                ay = ay + wz_c * dy_c * wx_c * f
                ax = ax + wz_c * wy_c * dx_c * f
        return af, az, ay, ax

    zero = jnp.zeros((tz, h, w), jnp.float32)
    af, az, ay, ax = jax.lax.fori_loop(
        0, 2 * K + 1, z_tap, (zero, zero, zero, zero))
    gf_out[:] = af
    gz_out[:] = az * g_c
    gy_out[:] = ay * g_c
    gx_out[:] = ax * g_c


@functools.lru_cache(maxsize=None)
def _bwd_fused_call(K: int, tz: int, Dp: int, Hp: int, Wp: int,
                    Hs: int, Ws: int):
    """Cached, vmappable fused-backward pallas_call (see _fwd_call)."""
    grid = (Dp // tz,)

    def call(stack):
        return pl.pallas_call(
            functools.partial(_bwd_fused_kernel, K=K, tz=tz),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(_block3(tz, Hp, Wp),) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((Dp, Hp, Wp), jnp.float32)
                for _ in range(4)),
            scratch_shapes=[
                pltpu.VMEM((5, tz + 2 * K, Hs, Ws), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(stack)

    return custom_batching.sequential_vmap(call)


@functools.lru_cache(maxsize=None)
def _bwd_vel_call(K: int, tz: int, Dp: int, Hp: int, Wp: int,
                  Hs: int, Ws: int):
    """Cached, vmappable grad-wrt-velocity pallas_call (see _fwd_call)."""
    grid = (Dp // tz,)

    def call(sz, sy, sx, gpad, fpad):
        return pl.pallas_call(
            functools.partial(_bwd_vel_kernel, K=K, tz=tz),
            grid=grid,
            in_specs=[_block3(tz, Hp, Wp)] * 4 + [
                pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(_block3(tz, Hp, Wp),) * 3,
            out_shape=tuple(
                jax.ShapeDtypeStruct((Dp, Hp, Wp), jnp.float32)
                for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((tz + 2 * K, Hs, Ws), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(sz, sy, sx, gpad, fpad)

    return custom_batching.sequential_vmap(call)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def advect_pallas(field: jax.Array, vel: jax.Array, dt: float = 1.0,
                  max_disp: float = 2.0, tz: int = 2) -> jax.Array:
    """Differentiable bounded-displacement advection, all three passes as
    Pallas slab kernels (3D scalar fields, clamp boundary). Matches
    ``advect(field, vel, dt, 'clamp', max_disp)``; ~3x the XLA window
    formulation on v5e for the forward and more for the transposes."""
    return pallas_window_advect(field, vel, dt=dt, max_disp=max_disp,
                                tz=tz)


def _advect_pallas_fwd(field, vel, dt, max_disp, tz):
    out = pallas_window_advect(field, vel, dt=dt, max_disp=max_disp, tz=tz)
    return out, (field, vel)


# Module flag for A/B benches (bench/advect_bench.py). The fused
# single-dispatch backward halves slab DMA traffic on paper but MEASURED
# SLOWER than the split two-kernel backward on v5e at the headline shape
# (6.33 vs 5.63 ms/iter full grad chain, 112x64x112, tz=2 — the kernels
# are VPU-compute-bound on the 125-tap loop, not DMA-bound, and the
# 4-output fused kernel schedules worse). Split stays the default; see
# docs/ROOFLINE.md "Fused advect backward".
FUSED_BWD = False


def _advect_pallas_bwd(dt, max_disp, tz, res, g):
    field, vel = res
    D, H, W = field.shape
    s, disp, (D_, H_, W_, Dp, Hp, Wp, Hs, Ws, K) = _prep(
        field, vel, dt, max_disp, tz)
    g32 = g.astype(jnp.float32)

    if FUSED_BWD:
        # ONE halo'd 5-plane stack (one XLA pad), ONE kernel dispatch.
        # Zero halo padding is safe on every plane: where j+o lands in
        # the pad region g is 0 (pull leg contributes nothing), and
        # push-leg outputs beyond (D, H, W) are sliced away below.
        stack = jnp.pad(
            jnp.stack([s[0], s[1], s[2], g32,
                       field.astype(jnp.float32)]),
            [(0, 0), (K, K + Dp - D), (K, Hs - H - K), (K, Ws - W - K)])
        gf, gz, gy, gx = _bwd_fused_call(K, tz, Dp, Hp, Wp, Hs, Ws)(stack)
        grad_field = gf[:D, :H, :W]
        grad_s = jnp.stack([x[:D, :H, :W] for x in (gz, gy, gx)],
                           axis=-1)
    else:
        # ---- grad wrt field: halo'd (sz, sy, sx, g) stack, pull transpose
        def halo(x):
            return jnp.pad(x, [(K, K + Dp - D), (K, Hs - H - K),
                               (K, Ws - W - K)])

        stack = jnp.stack([halo(s[0]), halo(s[1]), halo(s[2]), halo(g32)])
        grad_field = _bwd_field_call(K, tz, Dp, Hp, Wp, Hs, Ws)(
            stack)[:D, :H, :W]

        # ---- grad wrt velocity: forward-style kernel with derivatives
        pad_s = [(0, Dp - D), (0, Hp - H), (0, Wp - W)]
        sz, sy, sx = (jnp.pad(x, pad_s, constant_values=-10 * K)
                      for x in s)
        gpad = jnp.pad(g32, pad_s)
        fpad = jnp.pad(field.astype(jnp.float32),
                       [(K, K + Dp - D), (K, Hs - H - K),
                        (K, Ws - W - K)])
        gs = _bwd_vel_call(K, tz, Dp, Hp, Wp, Hs, Ws)(sz, sy, sx, gpad,
                                                      fpad)
        grad_s = jnp.stack([x[:D, :H, :W] for x in gs], axis=-1)

    # chain: s = clip(i - clip(dt*v)). JAX's clip subgradient is 1 strictly
    # inside, 0 strictly outside, and 0.5 AT either boundary (max/min JVPs
    # average at ties) — match it exactly.
    def clip_grad(x, lo, hi):
        inside = ((x > lo) & (x < hi)).astype(jnp.float32)
        at_edge = ((x == lo) | (x == hi)).astype(jnp.float32)
        return inside + 0.5 * at_edge

    idx = jnp.stack(
        [jax.lax.broadcasted_iota(jnp.float32, (D, H, W), a)
         for a in range(3)], axis=-1)
    sizes = jnp.array([D - 1, H - 1, W - 1], jnp.float32)
    raw = idx - jnp.clip(dt * vel.astype(jnp.float32),
                         -max_disp, max_disp)
    outer = clip_grad(raw, 0.0, sizes)
    inner = clip_grad(dt * vel.astype(jnp.float32), -max_disp, max_disp)
    grad_vel = (-dt) * grad_s * outer * inner
    return (grad_field.astype(field.dtype), grad_vel.astype(vel.dtype))


advect_pallas.defvjp(_advect_pallas_fwd, _advect_pallas_bwd)

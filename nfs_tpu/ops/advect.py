"""Semi-Lagrangian advection (reference: ``transform.py`` advect,
SURVEY.md §2 "Field ops"; TNST §4.2 transport parameterization, §6 window
transport).

``advect(field, vel)`` backtraces each cell center by the velocity and
samples the field there: ``out(x) = field(x - dt * v(x))``. Differentiable
w.r.t. both ``field`` and ``vel`` — the velocity gradient is the heart of
TNST's transport-based stylization (the optimization variable is a
stylization velocity field v_hat and d* = advect(d, v_hat)).

``advect_maccormack`` adds the BFECC/MacCormack error-compensation step the
reference's mantaflow data generator uses for the simulation velocities,
with a min/max limiter for unconditional stability.
"""

from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nfs_tpu.ops.interp import grid_sample, identity_coords


def _shift_zero(x: jax.Array, offsets, ndim_space: int) -> jax.Array:
    """out[i] = x[i + o] with zero fill outside (spatial axes only)."""
    pads = [(max(-o, 0), max(o, 0)) for o in offsets]
    pads += [(0, 0)] * (x.ndim - ndim_space)
    out = jnp.pad(x, pads)
    sl = []
    for ax, o in enumerate(offsets):
        start = pads[ax][0] + o
        sl.append(slice(start, start + x.shape[ax]))
    return out[tuple(sl)]


@partial(jax.jit, static_argnames=("mode", "max_disp"))
def _advect_window(field: jax.Array, vel: jax.Array, dt: float,
                   mode: str, max_disp: float) -> jax.Array:
    """Gather-free semi-Lagrangian advection for bounded displacement.

    TPU has no hardware gather: XLA's gather lowering costs ~67 ms for a
    112x64x112 trilinear sample on v5e (measured), three orders of
    magnitude off memory-bound. When the per-step displacement is bounded
    by ``max_disp`` cells (true for CFL-limited sim velocities and for
    stylization velocity fields), the sample is exactly a
    (2*ceil(max_disp)+3)**ndim-tap window sum of STATIC shifts with
    per-cell tent weights — pure pads/slices/VPU math that XLA fuses, and
    whose transpose (the field gradient) is the same shift structure.

    Displacements are clamped to +-max_disp (an implicit CFL regularizer
    on stylization velocities).
    """
    ndim = vel.shape[-1]
    spatial = field.shape[:ndim]
    K = int(math.ceil(max_disp)) + 1
    disp = jnp.clip(dt * vel.astype(jnp.float32), -max_disp, max_disp)
    idx = [jax.lax.broadcasted_iota(jnp.float32, spatial, a)
           for a in range(ndim)]
    if mode == "clamp":
        s = [jnp.clip(idx[a] - disp[..., a], 0, spatial[a] - 1)
             for a in range(ndim)]
    else:  # zero: keep raw backtrace; outside support falls to zero
        s = [idx[a] - disp[..., a] for a in range(ndim)]

    # per-axis tent-weight planes for offsets -K..K (axes 1..ndim-1 are
    # statically unrolled; axis 0 runs under lax.scan with dynamic rolls so
    # the graph stays (2K+1)**(ndim-1) terms — keeps XLA compile time sane
    # for 3D windows while fusing the hot inner loop)
    weights = [
        [jnp.maximum(0.0, 1.0 - jnp.abs(s[a] - (idx[a] + o)))
         for o in range(-K, K + 1)]
        for a in range(1, ndim)
    ]
    has_channels = field.ndim > ndim

    def shift0(x, o0):
        """dynamic shift along axis 0 with zero fill: out[i] = x[i + o0]"""
        rolled = jnp.roll(x, -o0, axis=0)
        i0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where((i0 + o0 >= 0) & (i0 + o0 < x.shape[0]),
                         rolled, 0.0)

    def axis0_term(acc, o0):
        w0 = jnp.maximum(0.0, 1.0 - jnp.abs(s[0] - (idx[0]
                                                    + o0.astype(jnp.float32))))
        f0 = shift0(field, o0)
        inner = jnp.zeros(field.shape, field.dtype)
        for off in itertools.product(range(-K, K + 1), repeat=ndim - 1):
            w = w0
            for a in range(ndim - 1):
                w = w * weights[a][off[a] + K]
            if has_channels:
                w = w[..., None]
            shifted = _shift_zero(f0, (0,) + off, ndim)
            inner = inner + (w * shifted).astype(field.dtype)
        return acc + inner, None

    acc, _ = jax.lax.scan(axis0_term, jnp.zeros(field.shape, field.dtype),
                          jnp.arange(-K, K + 1))
    return acc


@partial(jax.jit, static_argnames=("mode", "max_disp", "impl"))
def advect(field: jax.Array, vel: jax.Array, dt: float = 1.0,
           mode: str = "clamp",
           max_disp: Optional[float] = None,
           impl: str = "auto") -> jax.Array:
    """Semi-Lagrangian advection.

    Args:
      field: ``(*spatial)`` or ``(*spatial, C)``.
      vel: ``(*spatial, ndim)`` velocity, channel i = cells/frame along
        array axis i.
      dt: timestep in frames (negative to advect backwards).
      mode: boundary mode for sampling.
      max_disp: if set, use the gather-free bounded-displacement window
        formulation (see _advect_window) — displacements are clamped to
        +-max_disp cells. None = exact gather path (arbitrary
        displacement, slow transposes on TPU).
      impl: window-path backend. 'auto' resolves to the fused Pallas
        slab kernels on TPU for 3D scalar clamp-mode fields and the XLA
        window otherwise; 'xla'/'pallas' force a backend. Honest scanned
        device-time at 112x64x112, max_disp 2 on v5e: Pallas fwd+field-
        grad 2.3 ms vs XLA 8.9 ms (~4x; an earlier "only 1.1x on the
        VJP" figure was a per-dispatch measurement corrupted by the
        remote tunnel's dispatch floor — see bench/stages.py). Values
        AND both grads match the XLA window to float rounding (hardware-
        checked; tests cover interpret mode).
    """
    if max_disp is not None:
        use_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu"
            and field.ndim == 3 and vel.shape == field.shape + (3,)
            and mode == "clamp")
        if use_pallas:
            if not (field.ndim == 3 and vel.shape == field.shape + (3,)
                    and mode == "clamp"):
                raise ValueError(
                    "impl='pallas' supports 3D scalar clamp-mode fields")
            from nfs_tpu.ops.pallas_advect import advect_pallas

            # dt is traced under this jit; fold it into the velocity so
            # the custom_vjp's nondiff dt stays a literal (chain rule
            # through the multiply recovers the dt factor in grads).
            return advect_pallas(field, vel * dt, 1.0, max_disp).astype(
                field.dtype)
        return _advect_window(field, vel, dt, mode, max_disp)
    ndim = vel.shape[-1]
    coords = identity_coords(vel.shape[:-1]) - dt * vel.astype(jnp.float32)
    out = grid_sample(field, coords, mode=mode)
    return out.astype(field.dtype) if out.dtype != field.dtype else out


def _pool_minmax(field: jax.Array, radius: int,
                 spatial_ndim: Optional[int] = None):
    """(min, max) over a (2*radius+1)**d spatial neighborhood via
    reduce_window; a trailing channel axis (field.ndim > spatial_ndim) is
    pooled per-channel."""
    ndim = field.ndim if spatial_ndim is None else spatial_ndim
    win = (2 * radius + 1,) * ndim + (1,) * (field.ndim - ndim)
    strides = (1,) * field.ndim
    pad = [(radius, radius)] * ndim + [(0, 0)] * (field.ndim - ndim)
    mins = -jax.lax.reduce_window(-field, -jnp.inf, jax.lax.max, win,
                                  strides, pad)
    maxs = jax.lax.reduce_window(field, -jnp.inf, jax.lax.max, win,
                                 strides, pad)
    return mins, maxs


@partial(jax.jit, static_argnames=("mode", "max_disp"))
def advect_maccormack(field: jax.Array, vel: jax.Array, dt: float = 1.0,
                      mode: str = "clamp",
                      max_disp: Optional[float] = None) -> jax.Array:
    """MacCormack/BFECC advection with min-max limiting.

    fwd = SL(field, v, dt); bwd = SL(fwd, v, -dt);
    out = fwd + 0.5 * (field - bwd), clamped to the local stencil range.

    With ``max_disp`` set, both SL passes use the gather-free window path
    and the limiter uses a reduce_window min/max over the displacement
    neighborhood (a slightly looser but gather-free stability bound).
    """
    ndim = vel.shape[-1]
    if max_disp is not None:
        fwd = _advect_window(field, vel, dt, mode, max_disp)
        bwd = _advect_window(fwd, vel, -dt, mode, max_disp)
        out = fwd + 0.5 * (field - bwd)
        mins, maxs = _pool_minmax(field, int(math.ceil(max_disp)) + 1,
                                  spatial_ndim=ndim)
        return jnp.clip(out, mins, maxs)

    coords = identity_coords(vel.shape[:-1]) - dt * vel.astype(jnp.float32)
    fwd = grid_sample(field, coords, mode=mode)
    back_coords = identity_coords(vel.shape[:-1]) + dt * vel.astype(jnp.float32)
    bwd = grid_sample(fwd, back_coords, mode=mode)
    out = fwd + 0.5 * (field - bwd)

    # Limiter: clamp to min/max of the 2**ndim cells around the backtraced
    # point.
    lo = jnp.floor(coords).astype(jnp.int32)
    mins = None
    maxs = None
    spatial_shape = vel.shape[:-1]
    for corner in itertools.product((0, 1), repeat=ndim):
        idx = tuple(
            jnp.clip(lo[..., d] + corner[d], 0, spatial_shape[d] - 1)
            for d in range(ndim)
        )
        v = field[idx]
        mins = v if mins is None else jnp.minimum(mins, v)
        maxs = v if maxs is None else jnp.maximum(maxs, v)
    return jnp.clip(out, mins, maxs)


def advect_chain(field: jax.Array, vels: jax.Array, dt: float = 1.0,
                 mode: str = "clamp",
                 max_disp: Optional[float] = None) -> jax.Array:
    """Advect `field` through a sequence of velocity fields (lax.scan).

    Args:
      vels: ``(T, *spatial, ndim)`` — applied in order 0..T-1.

    Used by the temporal-coherence window loss (TNST §6): the stylized
    center-frame density is transported to each neighbor frame through the
    simulation's own velocities.
    """

    def step(f, v):
        return advect(f, v, dt=dt, mode=mode, max_disp=max_disp), None

    out, _ = jax.lax.scan(step, field, vels)
    return out

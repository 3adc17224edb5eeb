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

from functools import partial

import jax
import jax.numpy as jnp

from nfs_tpu.ops.interp import grid_sample, identity_coords


@partial(jax.jit, static_argnames=("mode",))
def advect(field: jax.Array, vel: jax.Array, dt: float = 1.0,
           mode: str = "clamp") -> jax.Array:
    """Semi-Lagrangian advection.

    Args:
      field: ``(*spatial)`` or ``(*spatial, C)``.
      vel: ``(*spatial, ndim)`` velocity, channel i = cells/frame along
        array axis i.
      dt: timestep in frames (negative to advect backwards).
      mode: boundary mode for sampling.
    """
    ndim = vel.shape[-1]
    coords = identity_coords(vel.shape[:-1]) - dt * vel.astype(jnp.float32)
    out = grid_sample(field, coords, mode=mode)
    return out.astype(field.dtype) if out.dtype != field.dtype else out


@partial(jax.jit, static_argnames=("mode",))
def advect_maccormack(field: jax.Array, vel: jax.Array, dt: float = 1.0,
                      mode: str = "clamp") -> jax.Array:
    """MacCormack/BFECC advection with min-max limiting.

    fwd = SL(field, v, dt); bwd = SL(fwd, v, -dt);
    out = fwd + 0.5 * (field - bwd), clamped to the local SL stencil range.
    """
    ndim = vel.shape[-1]
    coords = identity_coords(vel.shape[:-1]) - dt * vel.astype(jnp.float32)

    fwd = grid_sample(field, coords, mode=mode)
    back_coords = identity_coords(vel.shape[:-1]) + dt * vel.astype(jnp.float32)
    bwd = grid_sample(fwd, back_coords, mode=mode)
    out = fwd + 0.5 * (field - bwd)

    # Limiter: clamp to min/max of the 2**ndim cells around the backtraced
    # point (evaluated via min/max-pooled fields sampled with nearest floor).
    lo = jnp.floor(coords).astype(jnp.int32)
    mins = None
    maxs = None
    import itertools
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
                 mode: str = "clamp") -> jax.Array:
    """Advect `field` through a sequence of velocity fields (lax.scan).

    Args:
      vels: ``(T, *spatial, ndim)`` — applied in order 0..T-1.

    Used by the temporal-coherence window loss (TNST §6): the stylized
    center-frame density is transported to each neighbor frame through the
    simulation's own velocities.
    """

    def step(f, v):
        return advect(f, v, dt=dt, mode=mode), None

    out, _ = jax.lax.scan(step, field, vels)
    return out

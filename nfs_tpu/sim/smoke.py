"""JAX smoke solver (replaces the reference's mantaflow scene scripts,
SURVEY.md §3.1: inflow -> advect (MacCormack) -> buoyancy -> vorticity
confinement -> pressure projection -> export).

Cell-centered collocated grid (simpler than MAC and adequate for style-
transfer input data), Jacobi pressure projection (jit-friendly fixed
iteration count — lowers to a lax.scan of stencil ops, pure VPU work).
Works in 2D (H, W) and 3D (D, H, W); everything is jittable with static
shapes, so a whole N-frame sequence runs on-device via lax.scan
(:func:`smoke_sequence`).

Reference scene parity (SURVEY.md §2 "Scene scripts"): the 3D smoke-plume
config matching BASELINE is 112x64x112 x 200 frames; 2D is 256x192.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nfs_tpu.ops.advect import advect, advect_maccormack


def _divergence(v: jax.Array) -> jax.Array:
    """Central-difference divergence of a collocated velocity field."""
    ndim = v.shape[-1]
    div = jnp.zeros(v.shape[:-1], v.dtype)
    for ax in range(ndim):
        comp = v[..., ax]
        fwd = jnp.roll(comp, -1, axis=ax)
        bwd = jnp.roll(comp, 1, axis=ax)
        div = div + (fwd - bwd) * 0.5
    return div


def _gradient(p: jax.Array) -> jax.Array:
    grads = []
    for ax in range(p.ndim):
        fwd = jnp.roll(p, -1, axis=ax)
        bwd = jnp.roll(p, 1, axis=ax)
        grads.append((fwd - bwd) * 0.5)
    return jnp.stack(grads, axis=-1)


def _jacobi_pressure(div: jax.Array, iters: int) -> jax.Array:
    """Solve lap(p) = div with `iters` Jacobi sweeps (Neumann-ish via roll;
    adequate for generating style-transfer input data)."""
    ndim = div.ndim
    inv = 1.0 / (2.0 * ndim)

    def sweep(p, _):
        acc = jnp.zeros_like(p)
        for ax in range(ndim):
            acc = acc + jnp.roll(p, 1, axis=ax) + jnp.roll(p, -1, axis=ax)
        return (acc - div) * inv, None

    p, _ = jax.lax.scan(sweep, jnp.zeros_like(div), None, length=iters)
    return p


def _central_diff(f: jax.Array, axis: int) -> jax.Array:
    return (jnp.roll(f, -1, axis) - jnp.roll(f, 1, axis)) * 0.5


def _vorticity_confinement_3d(v: jax.Array, eps: float) -> jax.Array:
    """3D vorticity confinement (Fedkiw et al.): f = eps * (N x omega)
    with N = grad|omega| / |grad|omega||. Axis order (z, y, x), channels
    (vz, vy, vx)."""
    vz, vy, vx = v[..., 0], v[..., 1], v[..., 2]
    # omega = curl v, components in (z, y, x) order
    wz = _central_diff(vx, 1) - _central_diff(vy, 2)   # dvx/dy - dvy/dx
    wy = _central_diff(vz, 2) - _central_diff(vx, 0)   # dvz/dx - dvx/dz
    wx = _central_diff(vy, 0) - _central_diff(vz, 1)   # dvy/dz - dvz/dy
    mag = jnp.sqrt(wz ** 2 + wy ** 2 + wx ** 2)
    nz = _central_diff(mag, 0)
    ny = _central_diff(mag, 1)
    nx = _central_diff(mag, 2)
    nmag = jnp.sqrt(nz ** 2 + ny ** 2 + nx ** 2) + 1e-6
    nz, ny, nx = nz / nmag, ny / nmag, nx / nmag
    # N x omega in (z, y, x) components
    fz = ny * wx - nx * wy
    fy = nx * wz - nz * wx
    fx = nz * wy - ny * wz
    return eps * jnp.stack([fz, fy, fx], axis=-1)


def _vorticity_confinement_2d(v: jax.Array, eps: float) -> jax.Array:
    """2D vorticity confinement force."""
    vy, vx = v[..., 0], v[..., 1]  # axis0 (y), axis1 (x) components
    dvx_dy = (jnp.roll(vx, -1, 0) - jnp.roll(vx, 1, 0)) * 0.5
    dvy_dx = (jnp.roll(vy, -1, 1) - jnp.roll(vy, 1, 1)) * 0.5
    w = dvy_dx - dvx_dy  # scalar vorticity
    aw = jnp.abs(w)
    gy = (jnp.roll(aw, -1, 0) - jnp.roll(aw, 1, 0)) * 0.5
    gx = (jnp.roll(aw, -1, 1) - jnp.roll(aw, 1, 1)) * 0.5
    mag = jnp.sqrt(gx ** 2 + gy ** 2) + 1e-6
    nx, ny = gx / mag, gy / mag
    # f = eps * (N x w); in 2D: (ny*w, -nx*w) in (axis0, axis1) channels
    return eps * jnp.stack([-nx * w, ny * w], axis=-1)


@dataclasses.dataclass(frozen=True)
class SmokeConfig:
    shape: Tuple[int, ...] = (64, 48)
    buoyancy: float = 0.25
    vorticity: float = 0.1
    jacobi_iters: int = 40
    dissipation: float = 0.0
    # inflow: gaussian blob source position (fractions of shape) + radius
    source_center: Tuple[float, ...] = (0.85, 0.5)
    source_radius: float = 0.08
    source_rate: float = 0.6
    dt: float = 1.0
    # CFL-style displacement bound enabling the gather-free advection path
    # (nfs_tpu/ops/advect.py) — ~20x faster steps on TPU
    max_disp: float = 3.0


class SmokeSolver:
    """Stateless stepper: (d, v) -> (d, v). Buoyancy pushes along -axis0
    for 2D grids (index 0 grows downward in image convention) and -axis1
    (vertical y) for 3D (z, y, x) grids."""

    def __init__(self, cfg: SmokeConfig):
        self.cfg = cfg
        shape = cfg.shape
        ndim = len(shape)
        centers = [c * (s - 1) for c, s in zip(cfg.source_center, shape)]
        axes = [jnp.arange(s, dtype=jnp.float32) for s in shape]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        r2 = sum(((m - c) / (cfg.source_radius * max(shape))) ** 2
                 for m, c in zip(mesh, centers))
        self.source = jnp.exp(-r2).astype(jnp.float32)
        self.up_axis = 0 if ndim == 2 else 1

    @partial(jax.jit, static_argnames=("self",))
    def step(self, d: jax.Array, v: jax.Array):
        cfg = self.cfg
        ndim = d.ndim
        # 1. inflow
        d = jnp.clip(d + cfg.source_rate * self.source * cfg.dt, 0.0, 2.0)
        # 2. advect density & velocity (MacCormack for velocity)
        d = advect(d, v, dt=cfg.dt, max_disp=cfg.max_disp)
        v = jnp.stack(
            [advect_maccormack(v[..., i], v, dt=cfg.dt,
                               max_disp=cfg.max_disp)
             for i in range(ndim)], axis=-1)
        # 3. buoyancy (up = negative index direction on the up axis)
        v = v.at[..., self.up_axis].add(-cfg.buoyancy * d * cfg.dt)
        # 4. vorticity confinement
        if cfg.vorticity > 0:
            if ndim == 2:
                v = v + cfg.dt * _vorticity_confinement_2d(v, cfg.vorticity)
            else:
                v = v + cfg.dt * _vorticity_confinement_3d(v, cfg.vorticity)
        # 5. pressure projection
        p = _jacobi_pressure(_divergence(v), cfg.jacobi_iters)
        v = v - _gradient(p)
        # 6. dissipation
        if cfg.dissipation > 0:
            d = d * (1.0 - cfg.dissipation)
        return d, v


def smoke_sequence(cfg: SmokeConfig, n_frames: int, warmup: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the solver for n_frames (after `warmup` discarded steps) fully
    on-device; returns (densities (T, *shape), velocities (T, *shape, nd)).
    """
    solver = SmokeSolver(cfg)
    d0 = jnp.zeros(cfg.shape, jnp.float32)
    v0 = jnp.zeros(cfg.shape + (len(cfg.shape),), jnp.float32)

    @jax.jit
    def run(d, v):
        def warm(carry, _):
            d, v = carry
            return solver.step(d, v), None

        (d, v), _ = jax.lax.scan(warm, (d, v), None, length=warmup)

        def record(carry, _):
            d, v = carry
            d, v = solver.step(d, v)
            return (d, v), (d, v)

        _, (ds, vs) = jax.lax.scan(record, (d, v), None, length=n_frames)
        return ds, vs

    ds, vs = run(d0, v0)
    return np.asarray(ds), np.asarray(vs)

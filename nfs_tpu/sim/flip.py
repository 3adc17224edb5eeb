"""FLIP-lite liquid solver in JAX (replaces the reference's mantaflow FLIP
scenes used to generate LNST particle data, SURVEY.md §2 "Scene scripts").

Standard PIC/FLIP skeleton with static shapes throughout:
  P2G (splat mass+momentum) -> grid forces (gravity) -> pressure
  projection in the fluid mask -> G2P with PIC/FLIP blend -> particle
  advection with boundary clamping.

Particle count is fixed (jit-friendly); particles are seeded once from a
fluid region. This is a data generator for stylization, not a production
liquid solver — accuracy choices (collocated grid, Jacobi projection)
favor jittability and speed, matching the framework's self-containment
goal rather than mantaflow's full fidelity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nfs_tpu.core.pytrees import ParticleSet
from nfs_tpu.ops.splat import splat, splat_normalized, gather
from nfs_tpu.sim.smoke import _divergence, _gradient, _jacobi_pressure


@dataclasses.dataclass(frozen=True)
class FlipConfig:
    shape: Tuple[int, ...] = (64, 64)
    gravity: float = 0.15          # cells/frame^2 along +axis0 (down)
    flip_ratio: float = 0.95       # 1 = pure FLIP, 0 = pure PIC
    jacobi_iters: int = 40
    particles_per_cell: int = 4
    # initial fluid block (fractions of shape): lo/hi corners
    block_lo: Tuple[float, ...] = (0.05, 0.3)
    block_hi: Tuple[float, ...] = (0.5, 0.7)
    dt: float = 1.0


def seed_particles(cfg: FlipConfig, seed: int = 0) -> ParticleSet:
    """Jittered uniform seeding inside the initial fluid block."""
    rng = np.random.default_rng(seed)
    ndim = len(cfg.shape)
    lo = np.array([l * s for l, s in zip(cfg.block_lo, cfg.shape)])
    hi = np.array([h * s for h, s in zip(cfg.block_hi, cfg.shape)])
    cells = [np.arange(int(l), int(h)) for l, h in zip(lo, hi)]
    grid = np.stack(np.meshgrid(*cells, indexing="ij"),
                    axis=-1).reshape(-1, ndim)
    pts = np.repeat(grid, cfg.particles_per_cell, axis=0).astype(np.float32)
    pts += rng.random(pts.shape).astype(np.float32)
    return ParticleSet(
        x=jnp.asarray(pts),
        vel=jnp.zeros_like(jnp.asarray(pts)),
        dens=jnp.ones((pts.shape[0],), jnp.float32),
    )


class FlipSolver:
    def __init__(self, cfg: FlipConfig):
        self.cfg = cfg

    @partial(jax.jit, static_argnames=("self",))
    def step(self, x: jax.Array, vel: jax.Array):
        cfg = self.cfg
        shape = cfg.shape
        ndim = x.shape[-1]

        # P2G: mass-weighted velocity splat
        mass = splat(x, jnp.ones(x.shape[0], jnp.float32), shape,
                     kernel="bspline")
        v_grid = splat_normalized(x, vel, shape, kernel="bspline")

        # forces
        v_old = v_grid
        v_grid = v_grid.at[..., 0].add(cfg.gravity * cfg.dt)

        # pressure projection inside the fluid mask
        fluid = mass > 0.25
        div = _divergence(v_grid) * fluid
        p = _jacobi_pressure(div, cfg.jacobi_iters)
        v_grid = v_grid - _gradient(p) * fluid[..., None]

        # solid walls: zero normal velocity at domain faces
        for ax in range(ndim):
            comp = v_grid[..., ax]
            idx_lo = [slice(None)] * ndim
            idx_lo[ax] = 0
            idx_hi = [slice(None)] * ndim
            idx_hi[ax] = shape[ax] - 1
            comp = comp.at[tuple(idx_lo)].set(jnp.maximum(
                comp[tuple(idx_lo)], 0.0))
            comp = comp.at[tuple(idx_hi)].set(jnp.minimum(
                comp[tuple(idx_hi)], 0.0))
            v_grid = v_grid.at[..., ax].set(comp)

        # G2P: PIC/FLIP blend
        v_pic = gather(v_grid, x, kernel="bspline")
        dv = gather(v_grid - v_old, x, kernel="bspline")
        vel = cfg.flip_ratio * (vel + dv) + (1 - cfg.flip_ratio) * v_pic

        # advect particles (midpoint) and clamp to the domain
        x_mid = x + 0.5 * cfg.dt * vel
        v_mid = gather(v_grid, x_mid, kernel="bspline")
        x = x + cfg.dt * v_mid
        margin = 1.001
        x = jnp.stack(
            [jnp.clip(x[..., d], margin, shape[d] - 1 - margin)
             for d in range(ndim)], axis=-1)
        return x, vel


def liquid_sequence(cfg: FlipConfig, n_frames: int, seed: int = 0):
    """Run FLIP for n_frames on-device; returns list-like arrays
    (positions (T, N, nd), velocities (T, N, nd))."""
    solver = FlipSolver(cfg)
    p0 = seed_particles(cfg, seed)

    @jax.jit
    def run(x, vel):
        def record(carry, _):
            x, vel = carry
            x, vel = solver.step(x, vel)
            return (x, vel), (x, vel)

        _, (xs, vels) = jax.lax.scan(record, (x, vel), None,
                                     length=n_frames)
        return xs, vels

    xs, vels = run(p0.x, p0.vel)
    return np.asarray(xs), np.asarray(vels)

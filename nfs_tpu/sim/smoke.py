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
from typing import Optional, Tuple

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
        # all velocity components share ONE channeled MacCormack: 1/ndim
        # the window instances (compile) and one fused pass over memory
        # (runtime) vs per-component advection
        v = advect_maccormack(v, v, dt=cfg.dt, max_disp=cfg.max_disp)
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


def smoke_sequence(cfg: SmokeConfig, n_frames: int, warmup: int = 0,
                   chunk: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """Run the solver for n_frames (after `warmup` discarded steps) fully
    on-device; returns (densities (T, *shape), velocities (T, *shape, nd)).

    The run is chunked: ONE jitted scan of `chunk` steps is compiled and
    reused for every chunk (and for warmup). The solver body (MacCormack
    + 20-iter Jacobi + vorticity) compiles in O(minutes) at 3D production
    shapes — baking the frame count into the program meant every new T
    paid that compile; with a fixed chunk the persistent cache makes every
    sequence length after the first compile ~free. Chunk results stream to
    host per dispatch, so peak device memory is O(chunk) frames instead of
    O(T).
    """
    solver = SmokeSolver(cfg)
    d = jnp.zeros(cfg.shape, jnp.float32)
    v = jnp.zeros(cfg.shape + (len(cfg.shape),), jnp.float32)

    @jax.jit
    def run_chunk(d, v):
        def record(carry, _):
            d, v = carry
            d, v = solver.step(d, v)
            return (d, v), (d, v)

        (d, v), (ds, vs) = jax.lax.scan(record, (d, v), None, length=chunk)
        return d, v, ds, vs

    for _ in range(-(-warmup // chunk)):
        d, v, _, _ = run_chunk(d, v)
    # warmup rounds UP to a chunk multiple (more settle, never less)

    out_d, out_v = [], []
    done = 0
    while done < n_frames:
        d, v, ds, vs = run_chunk(d, v)
        take = min(chunk, n_frames - done)
        out_d.append(np.asarray(ds[:take]))
        out_v.append(np.asarray(vs[:take]))
        done += take
    return np.concatenate(out_d), np.concatenate(out_v)


def smoke_sequence_cached(cfg: SmokeConfig, n_frames: int,
                          cache_path: str, warmup: int = 0,
                          chunk: int = 16,
                          budget_s: Optional[float] = None) -> bool:
    """Resumable ``smoke_sequence``: chunk outputs and the solver carry
    state stream to ``{cache_path}.part.npz`` so generation survives
    interruption (SURVEY.md §5 failure recovery, applied to data gen —
    3D solver compiles are O(minutes) on a remote TPU and long runs may
    be time-boxed by the environment).

    Returns True when ``cache_path`` holds the complete sequence; False
    when the time budget ran out mid-way (re-invoke to continue — the
    result is bit-identical to an uninterrupted run since chunks are
    deterministic given the carried state).

    A ``cache_path`` ending in ``.npz`` finalizes to one monolithic file
    (legacy); any other path finalizes AS the chunk directory consumed
    by ``nfs_tpu.io.stream`` (no concatenation pass — block reads then
    overlap device compute instead of a multi-GB stall on slow disks).
    """
    import glob
    import os
    import shutil
    import time

    from nfs_tpu.io.stream import (finalize_sequence_dir,
                                   sequence_cache_complete)

    t0 = time.time()
    as_dir = not cache_path.endswith(".npz")
    part_dir = cache_path if as_dir else cache_path + ".part"
    state_path = os.path.join(part_dir, "state.npz")
    solver = SmokeSolver(cfg)
    nd = len(cfg.shape)
    if sequence_cache_complete(cache_path):
        return True
    os.makedirs(part_dir, exist_ok=True)
    if os.path.exists(state_path):
        with np.load(state_path) as z:
            d = jnp.asarray(z["carry_d"])
            v = jnp.asarray(z["carry_v"])
            done = int(z["done"])
        warmed = True
    else:
        d = jnp.zeros(cfg.shape, jnp.float32)
        v = jnp.zeros(cfg.shape + (nd,), jnp.float32)
        done, warmed = 0, False

    @jax.jit
    def run_chunk(d, v):
        def record(carry, _):
            d, v = carry
            d, v = solver.step(d, v)
            return (d, v), (d, v)

        (d, v), (ds, vs) = jax.lax.scan(record, (d, v), None, length=chunk)
        return d, v, ds, vs

    if not warmed:
        tc = time.time()
        for _ in range(-(-warmup // chunk)):
            d, v, _, _ = run_chunk(d, v)
        print(f"  sim warmup(+compile): {time.time() - tc:.1f}s",
              flush=True)

    while done < n_frames:
        tc = time.time()
        d, v, ds, vs = run_chunk(d, v)
        take = min(chunk, n_frames - done)
        # append-only chunk files + tiny carry state: O(chunk) IO per
        # chunk (re-writing the full accumulation each chunk was O(T^2))
        # NOTE: tmp name must NOT match the chunk_*.npz glob — a stale
        # tmp from a killed run would otherwise be read back as data
        tmp = os.path.join(part_dir, "tmp_chunk.npz")
        np.savez(tmp, d=np.asarray(ds[:take]), v=np.asarray(vs[:take]))
        os.replace(tmp, os.path.join(part_dir, f"chunk_{done:05d}.npz"))
        done += take
        np.savez(os.path.join(part_dir, "state_tmp.npz"),
                 carry_d=np.asarray(d), carry_v=np.asarray(v), done=done)
        os.replace(os.path.join(part_dir, "state_tmp.npz"), state_path)
        print(f"  sim frames {done}/{n_frames}: {time.time() - tc:.1f}s",
              flush=True)
        if budget_s is not None and time.time() - t0 > budget_s:
            if done < n_frames:
                return False
    if as_dir:
        os.unlink(state_path)
        finalize_sequence_dir(part_dir, n_frames, chunk)
        return True
    # legacy: concatenate chunk files -> one npz
    chunks = sorted(glob.glob(os.path.join(part_dir, "chunk_*.npz")))
    ds = np.concatenate([np.load(c)["d"] for c in chunks])[:n_frames]
    vs = np.concatenate([np.load(c)["v"] for c in chunks])[:n_frames]
    np.savez(cache_path + ".tmp.npz", d=ds, v=vs)
    os.replace(cache_path + ".tmp.npz", cache_path)
    shutil.rmtree(part_dir, ignore_errors=True)
    return True

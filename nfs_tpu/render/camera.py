"""Camera view-angle sampling (TNST §5 multi-view Poisson-disk sampling;
reference: poisson-disk sampler in util/poisson module, SURVEY.md §2).

Two samplers:

- :func:`poisson_disk_2d` — Bridson dart-throwing on the (theta, phi)
  rectangle. Inherently sequential/data-dependent, so it runs host-side
  (numpy), exactly like the reference (which sampled on host each
  iteration, SURVEY.md §3.2). For the jitted optimization loop we
  precompute a *pool* of view sets (:func:`poisson_view_pool`) shipped to
  device once; the loop indexes it with its PRNG — no host sync per step.

- :func:`sample_views_stratified` — a fully jittable stratified-jitter
  sampler (one sample per grid stratum of the angle rectangle), a
  well-spread drop-in when ``sample_type != 'poisson'``.

Angles are returned in **radians**, shape (n, 2) as (theta, phi).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def poisson_disk_2d(n: int, lo: Tuple[float, float], hi: Tuple[float, float],
                    rng: np.random.Generator, k: int = 30) -> np.ndarray:
    """Bridson Poisson-disk sampling of `n` points in the box [lo, hi].

    The disk radius is chosen from the box area so that ~n points fit
    (r = sqrt(A / (2*sqrt(3)*n)), hex-packing density); if dart throwing
    stalls before n points, the radius shrinks and sampling restarts.
    Returns (n, 2) float32. Degenerate boxes (zero extent) fall back to
    uniform jitter on the non-degenerate axes.
    """
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    ext = np.maximum(hi - lo, 0.0)
    if n <= 0:
        return np.zeros((0, 2), np.float32)
    if ext[0] * ext[1] <= 0.0:  # degenerate: uniform on the line/point
        pts = lo[None, :] + rng.random((n, 2)) * ext[None, :]
        return pts.astype(np.float32)

    area = ext[0] * ext[1]
    r = math.sqrt(area / (2.0 * math.sqrt(3.0) * n))
    for _ in range(8):  # shrink-and-retry
        pts = _bridson(n, lo, hi, r, rng, k)
        if pts.shape[0] >= n:
            return pts[:n].astype(np.float32)
        r *= 0.8
    # last resort: top up with uniform samples
    extra = lo[None, :] + rng.random((n - pts.shape[0], 2)) * ext[None, :]
    return np.concatenate([pts, extra], axis=0).astype(np.float32)


def _bridson(n, lo, hi, r, rng, k):
    cell = r / math.sqrt(2.0)
    gw = int(np.ceil((hi[0] - lo[0]) / cell)) + 1
    gh = int(np.ceil((hi[1] - lo[1]) / cell)) + 1
    grid = -np.ones((gw, gh), dtype=np.int64)
    pts = []
    active = []

    def gidx(p):
        return (int((p[0] - lo[0]) / cell), int((p[1] - lo[1]) / cell))

    def fits(p):
        gx, gy = gidx(p)
        x0, x1 = max(gx - 2, 0), min(gx + 3, gw)
        y0, y1 = max(gy - 2, 0), min(gy + 3, gh)
        for xx in range(x0, x1):
            for yy in range(y0, y1):
                j = grid[xx, yy]
                if j >= 0:
                    q = pts[j]
                    if (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 < r * r:
                        return False
        return True

    p0 = lo + rng.random(2) * (hi - lo)
    pts.append(p0)
    active.append(0)
    grid[gidx(p0)] = 0

    while active and len(pts) < n:
        ai = rng.integers(len(active))
        base = pts[active[ai]]
        found = False
        for _ in range(k):
            ang = rng.random() * 2 * math.pi
            rad = r * (1.0 + rng.random())
            cand = base + rad * np.array([math.cos(ang), math.sin(ang)])
            if (cand >= lo).all() and (cand <= hi).all() and fits(cand):
                grid[gidx(cand)] = len(pts)
                pts.append(cand)
                active.append(len(pts) - 1)
                found = True
                break
        if not found:
            active.pop(ai)
    return np.asarray(pts, dtype=np.float64).reshape(-1, 2)


def poisson_view_pool(pool_size: int, n_views: int,
                      theta_range: Tuple[float, float],
                      phi_range: Tuple[float, float],
                      seed: int = 0) -> np.ndarray:
    """Precompute `pool_size` Poisson-disk view sets.

    Angle ranges are in DEGREES (the reference's flag convention); output is
    (pool_size, n_views, 2) RADIANS (theta, phi), ready to ship to device.
    """
    rng = np.random.default_rng(seed)
    lo = (math.radians(theta_range[0]), math.radians(phi_range[0]))
    hi = (math.radians(theta_range[1]), math.radians(phi_range[1]))
    pool = np.stack(
        [poisson_disk_2d(n_views, lo, hi, rng) for _ in range(pool_size)])
    return pool.astype(np.float32)


def sample_views_stratified(key: jax.Array, n_views: int,
                            theta_range: Tuple[float, float],
                            phi_range: Tuple[float, float]) -> jax.Array:
    """Jittable stratified-jitter view sampling.

    Splits the (theta, phi) rectangle into an ~sqrt(n) x sqrt(n) grid of
    strata and jitters one sample in each. Ranges in DEGREES, output
    (n_views, 2) RADIANS.
    """
    gw = int(math.ceil(math.sqrt(n_views)))
    gh = int(math.ceil(n_views / gw))
    cells = jnp.stack(
        jnp.meshgrid(jnp.arange(gw), jnp.arange(gh), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)[:n_views].astype(jnp.float32)
    jit_k, perm_k = jax.random.split(key)
    u = jax.random.uniform(jit_k, (n_views, 2))
    frac = (cells + u) / jnp.array([gw, gh], dtype=jnp.float32)
    frac = jax.random.permutation(perm_k, frac, axis=0)
    lo = jnp.array([math.radians(theta_range[0]), math.radians(phi_range[0])])
    hi = jnp.array([math.radians(theta_range[1]), math.radians(phi_range[1])])
    return lo + frac * (hi - lo)

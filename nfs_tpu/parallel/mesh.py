"""Mesh construction over TPU slices (or the virtual CPU backend in tests).

Frames ride the outer mesh dimension so that, on a multi-slice/multi-host
topology, frame halos (small, infrequent) cross DCN while view reductions
(every step) stay inside a slice on ICI — the layout SURVEY.md §2's
collectives row prescribes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(frames: int = 1, views: int = 1, space: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (frames, views[, space]) mesh from the available devices.

    frames * views * space must divide the device count; leftover devices
    are unused (a warning-free truncation, explicit is better than
    implicit failure on odd pod shapes). With space > 1 the mesh carries a
    third ``space`` axis over which the engine shards each frame's VOLUME
    (GSPMD auto-partitioning — SURVEY.md §2's composed
    (frames, views, space) mesh for larger-than-HBM volume sequences).
    Space rides the INNERMOST mesh dimension: volume halo collectives run
    every advection tap, so they get the fastest ICI hops; frame halos
    (small, once per dispatch) ride the outermost.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = frames * views * space
    if need > len(devices):
        raise ValueError(
            f"mesh ({frames} frames x {views} views x {space} space = "
            f"{need}) exceeds {len(devices)} available devices")
    if space > 1:
        arr = np.array(devices[:need]).reshape(frames, views, space)
        return Mesh(arr, axis_names=("frames", "views", "space"))
    arr = np.array(devices[:need]).reshape(frames, views)
    return Mesh(arr, axis_names=("frames", "views"))


def mesh_shape_for(n_devices: int) -> Tuple[int, int]:
    """Default (frames, views) factorization of a device count: prefer a
    views axis of up to 2 (view rendering is cheap to reduce), everything
    else on frames (the embarrassingly parallel axis)."""
    if n_devices % 2 == 0 and n_devices > 2:
        return n_devices // 2, 2
    return n_devices, 1

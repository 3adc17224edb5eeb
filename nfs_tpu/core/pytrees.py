"""Pytree containers for fields and particle sets.

Conventions (used uniformly across the framework):

- A *grid* is a dense array whose leading axes are spatial in array-axis
  order: 2D density ``(H, W)`` indexed ``(y, x)``; 3D density ``(D, H, W)``
  indexed ``(z, y, x)``. Optional trailing channel axis.
- A *velocity grid* has a trailing channel axis whose channel ``i`` is the
  velocity component **along array axis i**, in cells per frame. (Mantaflow
  stores ``(x, y, z)`` channel order; :mod:`nfs_tpu.io` converts on load so
  that everything in-framework is axis-ordered.)
- *Particles* are ``(N, dim)`` positions in cell-index coordinates (axis
  order), with optional per-particle scalar/vector attributes.

Reference parity: the reference keeps raw numpy arrays throughout
(``util.py`` load/save, SURVEY.md §2); we add thin, jit-transparent
dataclass pytrees for self-description.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ParticleSet:
    """A particle system (LNST §4).

    x     : (N, dim) positions, cell-index coordinates (axis order).
    dens  : (N,) per-particle density weights (optional; ones if None).
    color : (N, 3) per-particle color (optional).
    vel   : (N, dim) particle velocities (optional, FLIP).
    """

    x: jax.Array
    dens: Optional[jax.Array] = None
    color: Optional[jax.Array] = None
    vel: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return self.x.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[-1]

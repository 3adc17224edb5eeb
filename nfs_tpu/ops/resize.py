"""Octave up/down-resampling (reference: ``transform.py`` resize/zoom,
SURVEY.md §2; DeepDream-style multi-scale octaves, TNST §4).

``resize`` wraps ``jax.image.resize`` (separable linear interpolation —
lowered by XLA to dense per-axis contractions, MXU-friendly) and handles
both scalar fields and velocity fields. Resizing a velocity field also
rescales the components so that "cells per frame" stays consistent at the
new resolution.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape", "is_velocity", "method"))
def resize(field: jax.Array, shape: Tuple[int, ...],
           is_velocity: bool = False, method: str = "linear") -> jax.Array:
    """Resize the spatial axes of a field to `shape`.

    Args:
      field: ``(*spatial)`` or ``(*spatial, C)``.
      shape: target spatial shape (len = ndim_space).
      is_velocity: if True, the trailing axis is a velocity channel axis and
        each component is multiplied by new_size/old_size of its axis.
    """
    ndim = len(shape)
    full_shape = tuple(shape) + tuple(field.shape[ndim:])
    out = jax.image.resize(field, full_shape, method=method)
    if is_velocity:
        scale = jnp.array(
            [shape[i] / field.shape[i] for i in range(ndim)],
            dtype=out.dtype,
        )
        out = out * scale
    return out


def octave_shape(shape: Sequence[int], octave: int, octave_n: int,
                 octave_scale: float) -> Tuple[int, ...]:
    """Spatial shape at `octave` (0 = coarsest, octave_n-1 = full res)."""
    factor = octave_scale ** (octave_n - 1 - octave)
    return tuple(max(1, int(round(s / factor))) for s in shape)


def octave_shapes(shape: Sequence[int], octave_n: int,
                  octave_scale: float) -> Tuple[Tuple[int, ...], ...]:
    """All octave shapes, coarse to fine; the last equals `shape`."""
    out = [
        octave_shape(shape, o, octave_n, octave_scale)
        for o in range(octave_n - 1)
    ]
    out.append(tuple(shape))
    return tuple(out)

"""Differentiable field operators (reference: ``transform.py``, SURVEY.md §2).

All ops are pure functions over jnp arrays, differentiable w.r.t. both the
field values and (where meaningful) the sampling coordinates / velocities,
and shaped for XLA:TPU — static shapes, no data-dependent Python control
flow.
"""

from nfs_tpu.ops.interp import grid_sample
from nfs_tpu.ops.advect import advect, advect_maccormack
from nfs_tpu.ops.rotate import rotate3d, rotation_matrix
from nfs_tpu.ops.shear import rotate3d_shear, shear
from nfs_tpu.ops.resize import resize, octave_shapes, octave_shape
from nfs_tpu.ops.splat import splat, splat_normalized

__all__ = [
    "grid_sample",
    "advect",
    "advect_maccormack",
    "rotate3d",
    "rotation_matrix",
    "rotate3d_shear",
    "shear",
    "resize",
    "octave_shapes",
    "octave_shape",
    "splat",
    "splat_normalized",
]

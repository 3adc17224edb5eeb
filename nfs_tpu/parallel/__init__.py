"""Device-mesh parallelism (no reference equivalent — the reference is one
GPU, one TF session; SURVEY.md §2 parallelism inventory maps each strategy
to its TPU-native construction here).

Axes:
  - ``frames``: data-parallel sharding of simulation frames; temporal
    window losses exchange +-W halo frames with ring ``ppermute`` over ICI
    (the ring-attention-shaped pattern of this workload, SURVEY.md §5
    "long-context").
  - ``views``: tensor-parallel-style sharding of camera views of one frame;
    per-view partial losses/grads reduce with ``psum``.
  - spatial ``pjit`` sharding of large volumes is available through
    standard NamedSharding annotations (see shard_volume).
"""

from nfs_tpu.parallel.mesh import make_mesh
from nfs_tpu.parallel.sharding import (
    halo_exchange,
    shard_volume,
    make_sharded_window_step,
)
from nfs_tpu.parallel.engine import ParallelSequenceStyler
from nfs_tpu.parallel.multihost import initialize_multihost
from nfs_tpu.parallel.particles import ParallelKeyframeStyler
from nfs_tpu.parallel.spatial import (
    prepare_spatial,
    shard_volume_spatial,
    spatial_mesh,
    stylize_frame_spatial,
)

__all__ = [
    "make_mesh",
    "halo_exchange",
    "shard_volume",
    "make_sharded_window_step",
    "ParallelSequenceStyler",
    "ParallelKeyframeStyler",
    "initialize_multihost",
    "prepare_spatial",
    "shard_volume_spatial",
    "spatial_mesh",
    "stylize_frame_spatial",
]

"""Core: typed configuration dataclasses, pytree containers, PRNG plumbing."""

from nfs_tpu.core.config import (
    StyleConfig,
    DataConfig,
    RenderConfig,
    LossConfig,
    OptimConfig,
    ParallelConfig,
    ParticleConfig,
)
from nfs_tpu.core.pytrees import ParticleSet

__all__ = [
    "StyleConfig",
    "DataConfig",
    "RenderConfig",
    "LossConfig",
    "OptimConfig",
    "ParallelConfig",
    "ParticleConfig",
    "ParticleSet",
]

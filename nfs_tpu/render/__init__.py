"""Differentiable renderer + camera sampling (reference: in-styler renderer,
SURVEY.md §1 L3; TNST §5)."""

from nfs_tpu.render.raymarch import render_volume, render_views, render2d
from nfs_tpu.render.camera import (
    poisson_disk_2d,
    poisson_view_pool,
    sample_views_stratified,
)
from nfs_tpu.render.transfer import (
    COLORMAPS,
    resolve_transfer,
    transfer_colors,
)

__all__ = [
    "render_volume",
    "render_views",
    "render2d",
    "poisson_disk_2d",
    "poisson_view_pool",
    "sample_views_stratified",
    "COLORMAPS",
    "resolve_transfer",
    "transfer_colors",
]

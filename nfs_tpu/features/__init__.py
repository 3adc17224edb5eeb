"""Loss network + objectives (reference: frozen-CNN plumbing in the styler,
SURVEY.md §2; BASELINE.json prescribes VGG-19 for the rebuild)."""

from nfs_tpu.features.vgg import (
    VGG_LAYERS,
    init_vgg_params,
    load_vgg_params,
    save_vgg_params,
    vgg_features,
    preprocess,
)
from nfs_tpu.features.losses import (
    gram_matrix,
    style_gram_targets,
    style_loss,
    semantic_loss,
    content_loss,
    tv_loss,
)

__all__ = [
    "VGG_LAYERS",
    "init_vgg_params",
    "load_vgg_params",
    "save_vgg_params",
    "vgg_features",
    "preprocess",
    "gram_matrix",
    "style_gram_targets",
    "style_loss",
    "semantic_loss",
    "content_loss",
    "tv_loss",
]

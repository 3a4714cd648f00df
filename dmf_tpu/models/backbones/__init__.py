from .resnet import ResNetFeatures, resnet50_features, resnet50d_features
from .vit import ViTFeatures, vit_base_patch16
from .importers import (
    adapt_first_conv,
    advanced_adapt_first_conv,
    import_resnet50,
    import_vit_base,
    map_rasool_to_timm_keys,
    resize_pos_embed,
)
from .registry import BackboneBundle, build_backbone, graft_backbone_variables

__all__ = [
    "ResNetFeatures",
    "resnet50_features",
    "resnet50d_features",
    "ViTFeatures",
    "vit_base_patch16",
    "adapt_first_conv",
    "advanced_adapt_first_conv",
    "import_resnet50",
    "import_vit_base",
    "map_rasool_to_timm_keys",
    "resize_pos_embed",
    "BackboneBundle",
    "build_backbone",
    "graft_backbone_variables",
]

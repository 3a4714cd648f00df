from .layers import (
    BatchNorm,
    ClassificationHead,
    FeatureDownAlign,
    FusionReduce,
    MaskGuidedSpatialAttention,
    MaskHeadResize,
    Projector,
    ReconHead,
    ResLiteBlock,
    SEBlock,
)
from .transformer import (
    MLP,
    MultiHeadSelfAttention,
    TransformerBlock,
    TransformerStage,
)
from .adapter import BackboneAdapter
from .encoder import Encoder
from .fusion import CrossAttentionBlock, FusionModel, GatingAttention

__all__ = [
    "BatchNorm",
    "ClassificationHead",
    "FeatureDownAlign",
    "FusionReduce",
    "MaskGuidedSpatialAttention",
    "MaskHeadResize",
    "Projector",
    "ReconHead",
    "ResLiteBlock",
    "SEBlock",
    "MLP",
    "MultiHeadSelfAttention",
    "TransformerBlock",
    "TransformerStage",
    "BackboneAdapter",
    "Encoder",
    "CrossAttentionBlock",
    "FusionModel",
    "GatingAttention",
]

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
from .ref_ckpt import (
    import_reference_encoder,
    import_reference_fusion,
    load_lightning_ckpt,
)

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
    "import_reference_encoder",
    "import_reference_fusion",
    "load_lightning_ckpt",
]

"""dmf_tpu — TPU-native deep multimodal fusion framework.

A from-scratch JAX/Flax/XLA/Pallas re-design of the capabilities of
``simhelgithub/Deep-Multimodal-Fusion-of-DCE-MRI-and-DWI-for-Automated-
Breast-Tumor-Classification-w.-Foundation``: DCE-MRI + DWI breast-tumor
molecular-subtype classification with foundation-model backbones, mask /
reconstruction / mimic auxiliary heads, late fusion with gating and
cross-attention, and TTA x MC-dropout uncertainty-aware inference — built
TPU-first (NHWC, bfloat16 compute, SPMD over jax.sharding meshes, Pallas
kernels on the hot paths).
"""

from .config import (
    Config,
    default_parameters,
    from_reference_dict,
    resolve_backbone_config,
    to_reference_dict,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "default_parameters",
    "from_reference_dict",
    "resolve_backbone_config",
    "to_reference_dict",
    "__version__",
]

"""Backbone registry — pure dispatcher replacing ``build_medical_backbone``
(foundation_model.py:490-573).

Differences by design: no config mutation (derived fields come from
``resolve_backbone_config``), no network downloads (checkpoints are local
files supplied via ``pretrained_path``; the reference pulled from HF Hub at
build time, foundation_model.py:72-97).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ...config import ModelConfig, resolve_backbone_config
from .importers import (
    import_resnet50,
    import_vit_base,
    map_rasool_to_timm_keys,
)
from .resnet import ResNetFeatures, resnet50_features, resnet50d_features
from .vit import ViTFeatures, vit_base_patch16


@dataclass
class BackboneBundle:
    """A backbone module plus (optionally) imported pretrained variables."""

    module: Any
    params: Optional[dict]
    batch_stats: Optional[dict]
    is_transformer: bool
    output_dims: Tuple[int, ...]


def _load_state_dict(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model_state_dict", "model", "encoder"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return ckpt


def build_backbone(
    mc: ModelConfig,
    in_channels: int,
    pretrained_path: Optional[str] = None,
    dtype=jnp.float32,
) -> BackboneBundle:
    """Build the backbone named by ``mc.backbone_str``.

    ``pretrained_path``: local torch checkpoint (timm-layout ResNet50 /
    ViT-B16, or a RadImageNet Lab-Rasool checkpoint).  When None the
    backbone is randomly initialized (init happens at Encoder.init time).
    """
    name = mc.backbone_str.lower()
    mc = resolve_backbone_config(mc)
    params = batch_stats = None

    if name in ("resnet50", "resnet50d", "radimagenet", "radimagenet_resnet50"):
        deep = name == "resnet50d"
        module = (resnet50d_features if deep else resnet50_features)(
            in_channels, dtype=dtype
        )
        if pretrained_path:
            sd = _load_state_dict(pretrained_path)
            if name.startswith("radimagenet"):
                sd = map_rasool_to_timm_keys(sd)
            # imagenet resnets honor use_input_adapt (foundation_model.py:40);
            # radimagenet always adapts (foundation_model.py:277-281)
            params, batch_stats = import_resnet50(
                sd, in_channels,
                use_advanced_adapt=mc.use_advanced_adapt,
                deep_stem=deep,
            )
        return BackboneBundle(module, params, batch_stats, False,
                              module.output_dims)

    if name in ("vit_base_patch16_224", "dino_vitbase16_pretrain"):
        module = vit_base_patch16(in_channels, img_size=mc.input_size,
                                  dtype=dtype)
        if pretrained_path:
            sd = _load_state_dict(pretrained_path)
            params, batch_stats = import_vit_base(
                sd, in_channels, img_size=mc.input_size,
                use_advanced_adapt=mc.use_advanced_adapt,
            )
            batch_stats = None
        return BackboneBundle(module, params, batch_stats or None, True,
                              module.output_dims)

    if name in ("uni2-h", "uni2h"):
        # declared but never dispatched in the reference either
        # (foundation_model.py:437-483: "not implemented")
        raise NotImplementedError(
            "UNI2-h (pathology ViT-H) is declared but not implemented, "
            "matching the reference"
        )

    raise ValueError(f"unknown backbone_str {mc.backbone_str!r}")


def graft_backbone_variables(encoder_variables: dict, bundle: BackboneBundle) -> dict:
    """Overwrite the encoder's randomly-initialized backbone params with the
    imported pretrained ones (checkpoint-import fidelity is load-bearing for
    AUC parity, SURVEY.md §7 'Hard parts').

    The backbone module is a field of the Encoder, so linen adopts its
    params at the top level under ``"backbone"``.
    """
    if bundle.params is None:
        return encoder_variables
    v = {k: dict(val) if isinstance(val, dict) else val
         for k, val in encoder_variables.items()}
    v["params"]["backbone"] = bundle.params
    if bundle.batch_stats is not None and "batch_stats" in v:
        v["batch_stats"]["backbone"] = bundle.batch_stats
    return v

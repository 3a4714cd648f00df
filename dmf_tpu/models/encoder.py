"""Single-modality encoder — the framework's main per-modality model.

Reference: ``ModelMaskHeadBackbone`` (model_module.py:481-733).  Structure:
optional SE modality attention on the raw channels -> optional backbone +
adapter -> block1 -> [mask head @f1] -> learned alpha-blend of backbone and
CNN features at f2/f3 (sigmoid-weighted, GroupNorm'd; model_module.py:673-675,
688-690) -> block2 -> [mask head @f2 with f1 alignment + spatial attention]
-> block3 OR hybrid TransformerStage + 1x1 projection -> pooled projections
for the mimic loss -> L2-normalized classification head.

Returns ``(logits, aux, mask_pred)`` with aux keys matching the reference
(model_module.py:726-733): raw_feats, recon_feats, proj_pairs, mask_attn_map,
mod_attn_map.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.resize import adaptive_avg_pool
from .adapter import BackboneAdapter
from .layers import (
    ClassificationHead,
    FeatureDownAlign,
    MaskGuidedSpatialAttention,
    MaskHeadResize,
    Projector,
    ResLiteBlock,
    SEBlock,
)
from .transformer import TransformerStage


class Encoder(nn.Module):
    method: str  # 'dwi' | 'dce'
    config: ModelConfig  # must be backbone-resolved (resolve_backbone_config)
    channel_num: int
    num_classes: int
    backbone: Optional[nn.Module] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mc: bool = False,
                 prefix_only: bool = False, prefix=None):
        """``prefix_only``/``prefix`` split the forward at the first
        dropout-bearing module: everything up to and including the backbone
        adapter is deterministic under MC-dropout inference, so the TTA x MC
        predictor computes it ONCE and replays only the suffix per MC pass
        (evals/predict.py).  ``prefix_only=True`` returns
        ``(x_in, mod_attn_map, backbone_feats_or_None)``; passing that tuple
        back as ``prefix`` skips the prefix modules (all modules here have
        explicit names, so skipping never shifts parameter paths).
        """
        mc_cfg = self.config
        c1, c2, c3 = mc_cfg.channels
        mask_pred = None
        mask_attn_map = None
        mod_attn_map = None

        # Cast the raw volume to the compute dtype at the boundary (no-op
        # for fp32 configs).  Without this the modality-SE multiply
        # promotes back to f32 (`x_f32 * w_bf16`), so the full-resolution
        # input tensor rides f32 through the prologue fwd AND bwd — the
        # r4 train profile showed the modality-SE weight-grad chain as f32
        # [B,256,256,C] fusions + layout copies at 21-53% of roofline.
        # Measured (r4, B=32 train step): structurally effective — copies
        # 4.9%->4.0% of device time, 314->262 full-res f32 HLO tensors —
        # but e2e-neutral (6.18->6.21 steps/s): XLA's bf16 tiny-channel
        # full-res reduce emitter is slower per byte than the f32 one it
        # replaces.  Kept for the cleaner all-bf16 compute path and the
        # halved prologue HBM traffic.
        x = jnp.asarray(x, self.dtype)

        # optional rematerialization of the heavy blocks (jax.checkpoint):
        # trades recompute for HBM in the backward pass
        if mc_cfg.remat:
            Block = nn.remat(ResLiteBlock, static_argnums=(2, 3))
        else:
            Block = ResLiteBlock

        if prefix is not None:
            x_in, mod_attn_map, bb = prefix
            f1_b, f2_b, f3_b = bb if bb is not None else (None, None, None)
            f1_in = f1_b if mc_cfg.use_backbone else x_in
        else:
            # ---- modality attention over raw input channels ----
            if mc_cfg.enable_modality_attention:
                x_in, mod_attn_map = SEBlock(
                    self.channel_num, reduction=2, dtype=self.dtype,
                    name="modality_attention",
                )(x)
            else:
                x_in = x

            # ---- optional backbone + adapter ----
            if mc_cfg.use_backbone:
                if self.backbone is None:
                    raise ValueError(
                        "use_backbone=True but no backbone module given"
                    )
                f1_b, f2_b, f3_b = BackboneAdapter(
                    backbone=self.backbone,
                    selected_indices_chains=tuple(
                        tuple(c) for c in mc_cfg.backbone_index_lists
                    ),
                    out_channels=(c1, c1, c2),
                    is_transformer=mc_cfg.transformer_backbone,
                    dtype=self.dtype,
                    name="backbone_adapter",
                )(x_in, train)
                f1_in = f1_b
            else:
                f1_b = f2_b = f3_b = None
                f1_in = x_in
            if prefix_only:
                bb = (f1_b, f2_b, f3_b) if mc_cfg.use_backbone else None
                return x_in, mod_attn_map, bb

        # ---- block1 ----
        f1, r1 = Block(
            in_ch=f1_in.shape[-1], out_ch=c1, downsample=mc_cfg.downsample[0],
            recon_ch=1, use_se=mc_cfg.use_se, dropout=mc_cfg.dropout,
            num_repeats=mc_cfg.repeat_blocks[0],
            downsample_each_repeat=mc_cfg.downsample_each_repeat,
            mid_squeeze=mc_cfg.mid_squeeze, dtype=self.dtype, name="block1",
        )(f1_in, train, mc)

        mask_on = mc_cfg.mask.enabled
        mask_stage = mc_cfg.mask.mask_stage.lower()
        mask_size = mc_cfg.mask.mask_target_size[0]

        if mask_on and mask_stage == "f1":
            mask_pred = MaskHeadResize(
                out_size=mask_size, dtype=self.dtype, name="mask_head"
            )(f1)
            f1, mask_attn_map = MaskGuidedSpatialAttention(
                dtype=self.dtype, name="mask_spatial_attention"
            )(f1, mask_pred)

        # ---- alpha-blend with backbone features at f2 ----
        if mc_cfg.use_backbone:
            f2_weight = self.param(
                "f2_weight", nn.initializers.constant(0.5), ()
            )
            alpha = nn.sigmoid(f2_weight)
            f2_in = nn.GroupNorm(num_groups=c1, epsilon=1e-5, dtype=self.dtype,
                                 name="norm_f2")(
                alpha * f2_b + (1 - alpha) * f1
            )
        else:
            f2_in = f1

        f2, r2 = Block(
            in_ch=c1, out_ch=c2, downsample=mc_cfg.downsample[1], recon_ch=1,
            use_se=mc_cfg.use_se, dropout=mc_cfg.dropout,
            num_repeats=mc_cfg.repeat_blocks[1],
            downsample_each_repeat=mc_cfg.downsample_each_repeat,
            mid_squeeze=mc_cfg.mid_squeeze, dtype=self.dtype, name="block2",
        )(f2_in, train, mc)

        if mask_on and mask_stage == "f2":
            f1_aligned = FeatureDownAlign(
                c1, c2, downsample=False, dtype=self.dtype, name="f1_to_f2"
            )(f1, train)
            mask_pred = MaskHeadResize(
                out_size=mask_size, dtype=self.dtype, name="mask_head"
            )(f2 + f1_aligned)
            f2, mask_attn_map = MaskGuidedSpatialAttention(
                dtype=self.dtype, name="mask_spatial_attention"
            )(f2, mask_pred)

        # ---- final stage: block3 or hybrid transformer ----
        if not mc_cfg.use_hybrid_transformer:
            if mc_cfg.use_backbone:
                f3_weight = self.param(
                    "f3_weight", nn.initializers.constant(0.5), ()
                )
                alpha = nn.sigmoid(f3_weight)
                f3_in = nn.GroupNorm(num_groups=c2, epsilon=1e-5, dtype=self.dtype,
                                     name="norm_f3")(
                    alpha * f3_b + (1 - alpha) * f2
                )
            else:
                f3_in = f2
            f3, _ = Block(
                in_ch=c2, out_ch=c3, downsample=mc_cfg.downsample[2],
                recon_ch=0, use_se=mc_cfg.use_se, dropout=mc_cfg.dropout,
                num_repeats=mc_cfg.repeat_blocks[2],
                downsample_each_repeat=mc_cfg.downsample_each_repeat,
                mid_squeeze=mc_cfg.mid_squeeze, dtype=self.dtype, name="block3",
            )(f3_in, train, mc)
            if mask_on and mask_stage == "f3":
                f2_aligned = FeatureDownAlign(
                    c2, c3, downsample=False, dtype=self.dtype, name="f2_to_f3"
                )(f2, train)
                mask_pred = MaskHeadResize(
                    out_size=mask_size, dtype=self.dtype, name="mask_head"
                )(f3 + f2_aligned)
                f3, mask_attn_map = MaskGuidedSpatialAttention(
                    dtype=self.dtype, name="mask_spatial_attention"
                )(f3, mask_pred)
        else:
            if mask_on and mask_stage == "f3":
                raise ValueError(
                    "mask_stage='f3' not supported with hybrid transformer"
                )
            f2_mid = TransformerStage(
                embed_dim=mc_cfg.transformer_embed_dim,
                depth=mc_cfg.transformer_depth,
                heads=mc_cfg.transformer_heads,
                patch_size=mc_cfg.transformer_patch_size,
                dtype=self.dtype,
                name="transformer",
            )(f2, train, mc)
            f3 = nn.Conv(c3, (1, 1), dtype=self.dtype, name="trans_out_proj")(
                f2_mid
            )

        # ---- projections for the mimic loss ----
        pd = mc_cfg.proj_dim
        f1_p = adaptive_avg_pool(f1, (pd, pd))
        f2_p = adaptive_avg_pool(f2, (pd, pd))
        r1_p = adaptive_avg_pool(r1, (pd, pd))
        r2_p = adaptive_avg_pool(r2, (pd, pd))
        p1 = Projector(pd, dtype=self.dtype, name="proj_f1")(f1_p, train)
        p2 = Projector(pd, dtype=self.dtype, name="proj_f2")(f2_p, train)
        p1_r = Projector(pd, dtype=self.dtype, name="proj_r1")(r1_p, train)
        p2_r = Projector(pd, dtype=self.dtype, name="proj_r2")(r2_p, train)

        logits = ClassificationHead(
            self.num_classes, dtype=self.dtype, name="classification_head"
        )(f3)

        aux = {
            "raw_feats": [f1, f2, f3],
            "recon_feats": [r1, r2],
            "proj_pairs": [p1, p1_r, p2, p2_r],
            "mask_attn_map": mask_attn_map,
            "mod_attn_map": mod_attn_map,
        }
        return logits, aux, mask_pred

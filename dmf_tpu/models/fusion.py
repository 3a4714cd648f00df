"""Dual-modality fusion model (Flax, NHWC).

Reference: ``FusionModel`` + helpers (model_module.py:745-1000): 1x1
projections of each encoder's deepest features to ``fusion_channels``,
concat+reduce, residual refinement, learned modality gating from pooled
vectors + mask confidences, cross-attention over pooled tokens, SE, fused
mask head, classifier, recon head, projector.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.attention import scaled_dot_product_attention
from ..ops.resize import adaptive_avg_pool, global_avg_pool, resize_bilinear
from .layers import (
    FusionReduce,
    MaskHeadResize,
    Projector,
    ReconHead,
    ResLiteBlock,
    SEBlock,
    conv_kernel_init,
    linear_kernel_init,
)


class GatingAttention(nn.Module):
    """Softmax modality gate over [pvec_dwi ‖ pvec_dce ‖ mask confidences].

    Reference: model_module.py:745-780.
    """

    use_mask_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pvec_dwi, pvec_dce, dwi_mask=None, dce_mask=None):
        if self.use_mask_attention and dwi_mask is not None and dce_mask is not None:
            dwi_conf = dwi_mask.mean(axis=(-3, -2)).reshape(dwi_mask.shape[0], -1)
            dce_conf = dce_mask.mean(axis=(-3, -2)).reshape(dce_mask.shape[0], -1)
            x = jnp.concatenate([pvec_dwi, pvec_dce, dwi_conf, dce_conf], axis=1)
        else:
            x = jnp.concatenate([pvec_dwi, pvec_dce], axis=1)
        logits = nn.Dense(2, dtype=self.dtype, kernel_init=linear_kernel_init,
                          name="fc")(x)
        return nn.softmax(logits, axis=1)


class CrossAttentionBlock(nn.Module):
    """Cross-attention on pooled tokens + LN-MLP FFN, returning weights.

    Reference: model_module.py:799-818 (torch ``nn.MultiheadAttention`` with
    packed qkv projection + out projection; weights averaged over heads).
    """

    channels: int
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_tokens, key_value_tokens, train: bool, mc: bool = False):
        B, Nq, C = query_tokens.shape
        Nk = key_value_tokens.shape[1]
        D = C // self.num_heads

        q = nn.Dense(C, dtype=self.dtype, kernel_init=linear_kernel_init,
                     name="q_proj")(query_tokens)
        k = nn.Dense(C, dtype=self.dtype, kernel_init=linear_kernel_init,
                     name="k_proj")(key_value_tokens)
        v = nn.Dense(C, dtype=self.dtype, kernel_init=linear_kernel_init,
                     name="v_proj")(key_value_tokens)

        def split(t, n):
            return t.reshape(B, n, self.num_heads, D).transpose(0, 2, 1, 3)

        out, weights = scaled_dot_product_attention(
            split(q, Nq), split(k, Nk), split(v, Nk), return_weights=True
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=linear_kernel_init,
                       name="out_proj")(out)
        # torch returns head-averaged weights by default
        weights = weights.mean(axis=1)

        ffn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out)
        ffn = nn.Dense(C, dtype=self.dtype, kernel_init=linear_kernel_init)(ffn)
        ffn = nn.gelu(ffn, approximate=False)
        ffn = nn.Dense(C, dtype=self.dtype, kernel_init=linear_kernel_init)(ffn)
        return out + ffn, weights


class FusionModel(nn.Module):
    """Reference: model_module.py:821-1000.

    ``__call__`` consumes the two encoders' ``raw_feats`` lists and mask
    predictions, returns ``(logits, fused_mask_logits, aux)`` with aux keys
    proj_fused / recon_fused / gating_weights / attn_weights / p_dwi / p_dce.
    """

    config: ModelConfig  # fusion model config (incl. fusion_specific)
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        raw_feats_dwi: Sequence[jnp.ndarray],
        raw_feats_dce: Sequence[jnp.ndarray],
        dwi_mask_pred: Optional[jnp.ndarray] = None,
        dce_mask_pred: Optional[jnp.ndarray] = None,
        train: bool = False,
        mc: bool = False,
    ):
        cfg = self.config
        fs = cfg.fusion_specific
        fc = fs.fusion_channels
        mask_size = cfg.mask.mask_target_size[0]

        f3_dwi = raw_feats_dwi[-1]
        f3_dce = raw_feats_dce[-1]

        # 1x1 projections to fusion_channels (identity if already matching)
        if f3_dwi.shape[-1] != fc:
            p_dwi = nn.Conv(fc, (1, 1), use_bias=False, dtype=self.dtype,
                            kernel_init=conv_kernel_init, name="proj_in_dwi")(f3_dwi)
        else:
            p_dwi = f3_dwi
        if f3_dce.shape[-1] != fc:
            p_dce = nn.Conv(fc, (1, 1), use_bias=False, dtype=self.dtype,
                            kernel_init=conv_kernel_init, name="proj_in_dce")(f3_dce)
        else:
            p_dce = f3_dce

        # concat + reduce, residual refine
        cat = jnp.concatenate([p_dwi, p_dce], axis=-1)
        reduced = FusionReduce(fc, dtype=self.dtype,
                               name="fusion_conv_reduce")(cat, train)
        residual, _ = ResLiteBlock(
            in_ch=fc, out_ch=fc, dropout=cfg.dropout, mid_squeeze=2,
            dtype=self.dtype, name="refine",
        )(reduced, train, mc)
        refined = nn.gelu(reduced + residual, approximate=False)

        # gating from pooled vectors (+ mask confidences)
        pvec_dwi = global_avg_pool(p_dwi)
        pvec_dce = global_avg_pool(p_dce)
        gating_weights = GatingAttention(
            use_mask_attention=fs.use_mask_attention, dtype=self.dtype,
            name="gating",
        )(pvec_dwi, pvec_dce, dwi_mask_pred, dce_mask_pred)
        alpha_dwi = gating_weights[:, 0][:, None, None, None]
        alpha_dce = gating_weights[:, 1][:, None, None, None]
        fused = alpha_dwi * p_dwi + alpha_dce * p_dce

        # cross-attention over pooled tokens, upsampled back
        attn_weights = None
        if fs.use_cross_attention:
            hp, wp = fs.token_pool
            t_dwi = adaptive_avg_pool(p_dwi, (hp, wp)).reshape(
                p_dwi.shape[0], hp * wp, fc
            )
            t_dce = adaptive_avg_pool(p_dce, (hp, wp)).reshape(
                p_dce.shape[0], hp * wp, fc
            )
            attn_out, attn_weights = CrossAttentionBlock(
                fc, num_heads=fs.mha_heads, dtype=self.dtype,
                name="cross_attn_block",
            )(t_dwi, t_dce, train, mc)
            lowres = attn_out.reshape(attn_out.shape[0], hp, wp, fc)
            up = resize_bilinear(lowres, fused.shape[-3:-1])
            fused = fused + up

        # optional SE
        if cfg.use_se:
            fused_refined, _ = SEBlock(fc, reduction=2, dtype=self.dtype,
                                       name="fusion_se")(fused)
        else:
            fused_refined = fused

        fused_mask_logits = MaskHeadResize(
            out_size=mask_size, dtype=self.dtype, name="mask_head"
        )(fused_refined)

        # classifier: pool -> flatten -> Linear (no L2-norm here, unlike the
        # single-model head; model_module.py:887-899)
        pooled = global_avg_pool(fused_refined)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=linear_kernel_init,
                          name="classifier")(pooled)

        recon_fused = ReconHead(fc, fs.fusion_recon_ch, dtype=self.dtype,
                                name="fusion_reconstruct")(fused_refined, train)
        proj_fused = Projector(cfg.proj_dim, dtype=self.dtype,
                               name="projF")(fused_refined, train)

        aux = {
            "proj_fused": proj_fused,
            "recon_fused": recon_fused,
            "gating_weights": gating_weights,
            "attn_weights": attn_weights,
            "p_dwi": p_dwi,
            "p_dce": p_dce,
        }
        return logits, fused_mask_logits, aux

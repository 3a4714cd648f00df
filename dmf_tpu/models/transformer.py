"""Hybrid CNN->Transformer stage (Flax, NHWC).

Reference: transformer_model.py:1-175 — PatchEmbed (strided conv patchify +
LayerNorm), pre-LN blocks with LayerScale residuals (init 0.1), hand-rolled
MHSA with attention/projection dropout 0.1, 4x MLP, tokens->feature-map
re-projection.  Attention routes through
:func:`dmf_tpu.ops.attention.scaled_dot_product_attention` (Pallas flash
kernel on TPU for the 4096-token default geometry).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import scaled_dot_product_attention
from .layers import conv_kernel_init, linear_kernel_init


class MultiHeadSelfAttention(nn.Module):
    """Reference: transformer_model.py:83-116."""

    embed_dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mc: bool = False):
        B, N, C = x.shape
        head_dim = self.embed_dim // self.num_heads
        drop_off = not (train or mc)

        qkv = nn.Dense(self.embed_dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, kernel_init=linear_kernel_init,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, D)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.attn_drop > 0.0 and (train or mc):
            # attention-weight dropout requires materialized weights
            out, w = scaled_dot_product_attention(q, k, v, return_weights=True)
            w = nn.Dropout(self.attn_drop, deterministic=False)(w)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        else:
            out = scaled_dot_product_attention(q, k, v)

        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(self.embed_dim, dtype=self.dtype,
                       kernel_init=linear_kernel_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=drop_off)(out)
        return out


class MLP(nn.Module):
    """Reference: transformer_model.py:118-134."""

    embed_dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mc: bool = False):
        drop_off = not (train or mc)
        hidden = int(self.embed_dim * self.mlp_ratio)
        x = nn.Dense(hidden, dtype=self.dtype, kernel_init=linear_kernel_init)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=drop_off)(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=linear_kernel_init)(x)
        x = nn.Dropout(self.drop, deterministic=drop_off)(x)
        return x


class TransformerBlock(nn.Module):
    """Pre-LN block with LayerScale residuals (init 0.1).

    Reference: transformer_model.py:68-81.
    """

    embed_dim: int
    heads: int
    init_scale: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mc: bool = False):
        gamma1 = self.param(
            "gamma1", nn.initializers.constant(self.init_scale), (self.embed_dim,)
        )
        gamma2 = self.param(
            "gamma2", nn.initializers.constant(self.init_scale), (self.embed_dim,)
        )
        attn = MultiHeadSelfAttention(self.embed_dim, self.heads,
                                      dtype=self.dtype, name="attn")
        mlp = MLP(self.embed_dim, dtype=self.dtype, name="mlp")
        x = x + attn(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x), train, mc) * gamma1
        x = x + mlp(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x), train, mc) * gamma2
        return x


class TransformerStage(nn.Module):
    """Patchify -> encoder blocks -> re-project to a feature map.

    Reference: transformer_model.py:137-175.  Input (B, H, W, C); output
    (B, H/p, W/p, embed_dim).
    """

    embed_dim: int
    depth: int = 2
    heads: int = 8
    patch_size: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mc: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, kernel_init=conv_kernel_init,
                    name="patch_embed")(x)
        B, Hp, Wp, C = x.shape
        tokens = x.reshape(B, Hp * Wp, C)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(tokens)
        for i in range(self.depth):
            tokens = TransformerBlock(self.embed_dim, self.heads,
                                      dtype=self.dtype, name=f"block{i}")(
                tokens, train, mc
            )
        return tokens.reshape(B, Hp, Wp, C)

"""ViT-B/16 feature backbone (Flax, NHWC input, per-block token outputs).

TPU-native equivalent of the reference's timm ViT/DINO ``features_only``
backbone (foundation_model.py:371-431): 12 pre-LN blocks, each block's
token output returned (cls token stripped) so the BackboneAdapter can chain
them ([0-2], [3-6], [7-11] — foundation_model.py:527-531).  Position
embeddings are sized for the configured image size (the reference overrides
``img_size=256``); importers bicubically resize pretrained 224-grid
embeddings.  Attention routes through the shared attention op (Pallas flash
kernel on TPU for the 256-token geometry it falls back to XLA — the win is
on the hybrid stage's 4096 tokens, not here).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import scaled_dot_product_attention


class ViTSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        D = self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * self.embed_dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, D).transpose(2, 0, 3, 1, 4)
        out = scaled_dot_product_attention(qkv[0], qkv[1], qkv[2])
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + ViTSelfAttention(self.embed_dim, self.num_heads,
                                 dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.embed_dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class ViTFeatures(nn.Module):
    """``__call__(x, train) -> [block outputs as (B, N, C) token tensors]``."""

    in_channels: int = 3
    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_indices: Tuple[int, ...] = tuple(range(12))
    dtype: Any = jnp.float32

    @property
    def output_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim for _ in self.out_indices)

    @property
    def reductions(self) -> Tuple[int, ...]:
        return tuple(self.patch_size for _ in self.out_indices)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        B = x.shape[0]
        p = self.patch_size
        n_patches = (self.img_size // p) ** 2

        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(B, -1, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, n_patches + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)), x],
                            axis=1)
        x = x + pos

        feats = []
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, dtype=self.dtype,
                         name=f"block{i}")(x)
            if i in self.out_indices:
                feats.append(x[:, 1:])  # strip cls token -> (B, N, C)
        return feats


def vit_base_patch16(in_channels: int, img_size: int = 256,
                     dtype=jnp.float32) -> ViTFeatures:
    return ViTFeatures(in_channels=in_channels, img_size=img_size, dtype=dtype)

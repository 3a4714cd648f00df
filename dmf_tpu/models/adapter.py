"""Backbone feature adapter (Flax, NHWC).

Reference: ``BackboneAdapter`` (model_module.py:401-476) — concatenates
selected backbone feature indices per chain and passes each through a
2x(3x3 conv + BN + GELU) neck to produce f1_b/f2_b/f3_b.  Transformer-token
features (B, N, C) are reshaped to (B, sqrt(N), sqrt(N), C).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, conv_kernel_init


class BackboneAdapter(nn.Module):
    backbone: nn.Module
    selected_indices_chains: Tuple[Tuple[int, ...], ...]
    out_channels: Tuple[int, int, int]
    is_transformer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        feats = self.backbone(x, train=train)
        outputs = []
        for i, chain in enumerate(self.selected_indices_chains):
            chain_feats = []
            for idx in chain:
                f = feats[idx]
                if self.is_transformer and f.ndim == 3:
                    B, N, C = f.shape
                    side = int(math.isqrt(N))
                    f = f.reshape(B, side, side, C)
                chain_feats.append(f)
            cat = jnp.concatenate(chain_feats, axis=-1)
            out = cat
            for j in range(2):
                out = nn.Conv(
                    self.out_channels[i], (3, 3), dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                    name=f"neck_f{i + 1}_conv{j}",
                )(out)
                out = BatchNorm(self.dtype, name=f"neck_f{i + 1}_bn{j}")(out, train)
                out = nn.gelu(out, approximate=False)
            outputs.append(out)
        return outputs[0], outputs[1], outputs[2]

"""Backbone feature adapter (Flax, NHWC).

Reference: ``BackboneAdapter`` (model_module.py:401-476) — concatenates
selected backbone feature indices per chain and passes each through a
2x(3x3 conv + BN + GELU) neck to produce f1_b/f2_b/f3_b.  Transformer-token
features (B, N, C) are reshaped to (B, sqrt(N), sqrt(N), C).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, conv_kernel_init
from ..ops import conv3x3_pallas as cp


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
                conv = nn.Conv(
                    self.out_channels[i], (3, 3), dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                    name=f"neck_f{i + 1}_conv{j}",
                )
                bn_name = f"neck_f{i + 1}_bn{j}"
                # Serving fast path: the whole 3x3-conv+BN+GELU neck stage
                # as one Pallas matmul kernel.  XLA's batch-in-sublanes
                # conv emitter is the profiled fp-serving outlier at the
                # 64^2x128 neck_f1 geometry (2.7 ms vs ~1 ms roofline;
                # measured in-context marginal cost 4.7 ms XLA vs 0.9 ms
                # kernel, scripts/bench_conv3x3.py) — see
                # ops/conv3x3_pallas.py.  Identical params/structure; no
                # gradient flows through eval forwards.
                if (not train and not self.is_initializing()
                        and jax.default_backend() == "tpu"
                        and cp.neck_enabled()
                        and cp.site_ok(f"neck_f{i + 1}_conv{j}")
                        and cp.geometry_ok(out.shape,
                                           self.out_channels[i], out.dtype)):
                    p = self.get_variable("params", f"neck_f{i + 1}_conv{j}")
                    bnp = self.get_variable("params",
                                            bn_name)["BatchNorm_0"]
                    bns = self.get_variable("batch_stats",
                                            bn_name)["BatchNorm_0"]
                    out = cp.conv3x3_bn_gelu(
                        out, p["kernel"], p["bias"], bnp["scale"],
                        bnp["bias"], bns["mean"], bns["var"])
                else:
                    out = conv(out)
                    out = BatchNorm(self.dtype, name=bn_name)(out, train)
                    out = nn.gelu(out, approximate=False)
            outputs.append(out)
        return outputs[0], outputs[1], outputs[2]

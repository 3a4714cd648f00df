"""ResNet-50/50d feature backbones (Flax, NHWC, dilated output_stride=8).

TPU-native equivalents of the reference's timm ``features_only`` backbones
(foundation_model.py:15-68, 220-312): return [C2, C3, C4, C5] feature maps
at strides (4, 8, 8, 8) — layers 3/4 trade stride for dilation when
``output_stride=8`` (timm's dilated scheme).  Channels (256, 512, 1024,
2048).  ``resnet50d`` adds the deep 3x3 stem and avg-pool downsample
shortcuts.  Weights import from timm / RadImageNet checkpoints via
``importers.py``.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # torch-semantics BN (unbiased running-var update) so fine-tuning an
        # imported checkpoint accumulates the same stats torch would
        from ..layers import TorchBatchNorm

        return TorchBatchNorm(
            use_running_average=not train, dtype=self.dtype,
            name="BatchNorm_0",
        )(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride/dilation) -> 1x1 x4 bottleneck with projection
    shortcut; stride placed on the 3x3 (timm/torchvision-B style)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 0  # 0 -> same as dilation
    avg_down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * 4
        identity = x
        if x.shape[-1] != out_ch or self.stride != 1:
            if self.avg_down and self.stride != 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride),
                    strides=(self.stride, self.stride),
                )
                identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                                   dtype=self.dtype, name="downsample_conv")(identity)
            else:
                identity = nn.Conv(
                    out_ch, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="downsample_conv",
                )(identity)
            identity = _BN(self.dtype, name="downsample_bn")(identity, train)

        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _BN(self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        # torch pads dilation*(k-1)/2 on both sides; SAME differs for
        # strided convs on even inputs.  The 3x3 uses first_dilation — in
        # timm/torchvision's dilated scheme the FIRST block of a newly
        # dilated stage keeps the previous stage's dilation (timm resnet
        # make_blocks prev_dilation plumbing); getting this wrong silently
        # changes activations under imported pretrained checkpoints.
        d = self.first_dilation or self.dilation
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(d, d), padding=((d, d), (d, d)),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = _BN(self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = _BN(self.dtype, name="bn3")(out, train)
        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """Feature-pyramid ResNet.  ``__call__(x, train) -> [C2, C3, C4, C5]``."""

    in_channels: int = 3
    layers: Tuple[int, ...] = (3, 4, 6, 3)  # resnet50
    deep_stem: bool = False  # resnet50d
    avg_down: bool = False  # resnet50d
    output_stride: int = 8
    dtype: Any = jnp.float32

    # metadata mirroring timm feature_info (foundation_model.py:63-67)
    @property
    def output_dims(self) -> Tuple[int, ...]:
        return (256, 512, 1024, 2048)

    @property
    def reductions(self) -> Tuple[int, ...]:
        if self.output_stride == 8:
            return (4, 8, 8, 8)
        return (4, 8, 16, 32)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        # ---- stem ----
        if self.deep_stem:
            for i, ch in enumerate((32, 32, 64)):
                x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype, name=f"stem_conv{i + 1}")(x)
                x = _BN(self.dtype, name=f"stem_bn{i + 1}")(x, train)
                x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = _BN(self.dtype, name="bn1")(x, train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # ---- stages; dilate instead of stride past output_stride ----
        planes = (64, 128, 256, 512)
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        current_stride = 4
        for i in range(1, 4):
            if current_stride * strides[i] > self.output_stride and i >= 2:
                dilations[i] = dilations[i - 1] * strides[i]
                strides[i] = 1
            else:
                current_stride *= strides[i]

        feats = []
        for stage in range(4):
            prev_dilation = dilations[stage - 1] if stage > 0 else 1
            for block in range(self.layers[stage]):
                x = Bottleneck(
                    planes=planes[stage],
                    stride=strides[stage] if block == 0 else 1,
                    dilation=dilations[stage],
                    first_dilation=(prev_dilation if block == 0
                                    else dilations[stage]),
                    avg_down=self.avg_down,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train)
            feats.append(x)
        return feats


def resnet50_features(in_channels: int, dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(in_channels=in_channels, dtype=dtype)


def resnet50d_features(in_channels: int, dtype=jnp.float32) -> ResNetFeatures:
    return ResNetFeatures(in_channels=in_channels, deep_stem=True,
                          avg_down=True, dtype=dtype)

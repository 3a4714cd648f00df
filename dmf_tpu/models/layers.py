"""Core Flax building blocks (NHWC, bf16-friendly).

TPU-native re-designs of the reference's nn.Modules (model_module.py:25-396):
same math, channels-last layout, BatchNorm/Dropout threaded through explicit
``train``/``mc`` flags so MC-dropout inference (dropout on, BN frozen —
train.py:483-506) is a pure function of the rng.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import adaptive_avg_pool, global_avg_pool, resize_bilinear

# torch-parity initializers:
#  - convs keep torch's default kaiming_uniform(a=sqrt(5)) ≡ U(±sqrt(1/fan_in))
#  - Linear layers get the reference's explicit kaiming_uniform(a=0)
#    (model_module.py:1002-1008) ≡ U(±sqrt(6/fan_in))
#  - BatchNorm scale ~ N(1, 0.02), bias 0 (model_module.py:1009-1013)
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
linear_kernel_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# Per-sample BN weighting (exact padded-tail semantics under a mesh)
# ---------------------------------------------------------------------------
# Train-mode BatchNorm couples samples through the batch statistics, so a
# tail batch padded with duplicate rows (the mesh path's pad_to_multiple)
# would silently shift every valid row's normalization.  The train steps set
# a (B,) 0/1 validity weight here, AT TRACE TIME, around model.apply;
# TorchBatchNorm then computes weighted moments in which padded rows vanish
# — reproducing the short-batch statistics exactly.  A plain Python stack
# (not a flax arg) keeps every module signature unchanged; the stored value
# is a tracer and is only read while the enclosing step is being traced.

_BN_SAMPLE_WEIGHT: list = []


@contextlib.contextmanager
def bn_sample_weight(w):
    """Scope a per-sample (B,) validity weight over train-mode BN stats.

    ``w=None`` is a no-op scope (unweighted BN, bit-identical behavior)."""
    _BN_SAMPLE_WEIGHT.append(w)
    try:
        yield
    finally:
        _BN_SAMPLE_WEIGHT.pop()


def current_bn_sample_weight():
    return _BN_SAMPLE_WEIGHT[-1] if _BN_SAMPLE_WEIGHT else None


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's EXACT training semantics.

    torch.nn.BatchNorm2d normalizes by the biased batch variance but updates
    ``running_var`` with the UNBIASED estimate (Bessel-corrected); Flax's
    ``nn.BatchNorm`` stores the biased one, so after training the stored var
    is ~(n-1)/n of torch's — a silent eval-time divergence that compounds
    against the AUC-parity north star.  Validated against torch in train
    mode by tests/test_fullmodel_parity.py.

    Inside a :func:`bn_sample_weight` scope, train-mode moments are weighted
    per sample (padded duplicate rows get weight 0), with the unbiased
    correction using the weighted count — exactly the short batch's stats.
    """

    use_running_average: bool
    momentum: float = 0.1  # torch momentum convention (new-stat weight)
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", self.scale_init, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), jnp.float32),
        )
        xf = x.astype(jnp.float32)
        w = None if self.use_running_average else current_bn_sample_weight()
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif w is not None:
            axes = tuple(range(x.ndim - 1))
            wb = w.astype(jnp.float32).reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1)
            )
            spatial = 1
            for a in axes[1:]:
                spatial *= x.shape[a]
            n = w.astype(jnp.float32).sum() * spatial  # weighted element count
            denom = jnp.maximum(n, 1.0)
            mean = (xf * wb).sum(axes) / denom
            var = (wb * jnp.square(xf - mean)).sum(axes) / denom
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)  # biased: normalization
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch-default hyperparams and reference init."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return TorchBatchNorm(
            use_running_average=not train,
            dtype=self.dtype,
            scale_init=bn_scale_init,
            name="BatchNorm_0",
        )(x)


class SEBlock(nn.Module):
    """Squeeze-excitation returning ``(x * w, w)``.

    Reference: model_module.py:25-47 (reduction=2; also aliased as
    TemporalAttention / ChannelAttention modality attention over the raw
    input channels, model_module.py:584-591).

    ``fused=True`` (serving only — callers pass it when no gradient will
    flow) requests the single-pass Pallas kernel
    (ops/se_pallas.py): one HBM read + one write of the feature map
    instead of XLA's pool-read + scale-read + write.  The XLA path stays
    the differentiable/init/CPU route.  The dispatch additionally requires
    the measured-win gate ``se_pallas.enabled()`` (env ``DMF_FUSED_SE=1``):
    the first-cut kernel REGRESSED end-to-end serving on the v5e
    (per-sample grid overhead; see ops/se_pallas.py docstring), so fused
    stays opt-in until the on-chip microbench (scripts/bench_se.py) proves
    the batch-tiled rewrite wins at the flagship geometries.
    """

    channels: int
    reduction: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fused: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mid = max(self.channels // self.reduction, 1)
        if (fused and not self.is_initializing() and x.ndim == 4
                and jax.default_backend() == "tpu"):
            from ..ops.se_pallas import enabled, fits_vmem, se_scale

            if enabled() and fits_vmem(x.shape, x.dtype):
                p0 = self.get_variable("params", "Dense_0")
                p1 = self.get_variable("params", "Dense_1")
                return se_scale(x, p0["kernel"], p0["bias"],
                                p1["kernel"], p1["bias"])
        w = global_avg_pool(x)  # (B, C)
        w = nn.Dense(mid, dtype=self.dtype, kernel_init=conv_kernel_init)(w)
        w = nn.gelu(w, approximate=False)
        w = nn.Dense(self.channels, dtype=self.dtype, kernel_init=conv_kernel_init)(w)
        w = nn.sigmoid(w)
        w = w[:, None, None, :]
        return x * w, w


class MaskGuidedSpatialAttention(nn.Module):
    """Modulate features by an attention map learned from the predicted mask.

    Reference: model_module.py:49-97 — ``out = x * (1 + gamma * A)`` with
    learnable gamma (init 0.1) and A clamped to (1e-4, 1-1e-4).
    """

    hidden_channels: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_features, mask_features):
        gamma = self.param("gamma", lambda k: jnp.asarray(0.1, jnp.float32))
        target = img_features.shape[-3:-1]
        mask_up = resize_bilinear(mask_features, target)
        a = nn.Conv(
            self.hidden_channels, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=conv_kernel_init,
        )(mask_up)
        a = nn.GroupNorm(num_groups=1, epsilon=1e-5,  # torch GN default
                         dtype=self.dtype)(a)
        a = nn.gelu(a, approximate=False)
        a = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=conv_kernel_init)(a)
        a = nn.sigmoid(a)
        a = jnp.clip(a, 1e-4, 1.0 - 1e-4)
        return img_features * (1.0 + gamma * a), a


class ReconHead(nn.Module):
    """3x3 conv -> BN -> GELU -> 3x3 conv reconstruction head.

    Reference: model_module.py:100-125.
    """

    in_ch: int
    recon_ch: int = 1
    upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out = nn.Conv(
            self.in_ch, (3, 3), use_bias=False, dtype=self.dtype,
            kernel_init=conv_kernel_init,
        )(x)
        out = BatchNorm(self.dtype)(out, train)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(self.recon_ch, (3, 3), dtype=self.dtype,
                      kernel_init=conv_kernel_init)(out)
        if self.upsample:
            out = resize_bilinear(out, (out.shape[-3] * 2, out.shape[-2] * 2))
        return out


class MaskHeadResize(nn.Module):
    """Mask head: 1x1 proj -> strided-conv chain down to ``out_size``.

    Reference: model_module.py:131-215.  The reference builds a static
    dispatch table over input sizes {32,64,128,256,512}; with XLA the input
    size is static at trace time, so only the required chain is materialized.
    Falls back to bilinear interpolation for non-power-of-two sizes, like the
    reference's ``"interp"`` branch.
    """

    mid_ch: int = 64
    out_ch: int = 1
    out_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype,
                    kernel_init=conv_kernel_init)(x)
        size = x.shape[-2]
        if size in (64, 128, 256, 512) and size > self.out_size:
            steps = 0
            s = size
            while s > self.out_size:
                s //= 2
                steps += 1
            for _ in range(steps):
                # explicit torch-style padding: SAME != torch pad=1 for
                # stride-2 convs on even inputs
                x = nn.Conv(
                    self.mid_ch, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    kernel_init=conv_kernel_init,
                )(x)
                x = nn.gelu(x, approximate=False)
        elif size != self.out_size:
            x = resize_bilinear(x, (self.out_size, self.out_size))
        return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                       kernel_init=conv_kernel_init)(x)


class ResLiteBlock(nn.Module):
    """Residual bottleneck stack with optional SE and reconstruction head.

    Reference: ``ResNetLiteBlock_withRecon`` (model_module.py:220-316).
    Returns ``(features, recon_or_None)``.
    """

    in_ch: int
    out_ch: int
    downsample: bool = False
    recon_ch: int = 1
    use_se: bool = False
    se_reduction: int = 2
    dropout: float = 0.4
    num_repeats: int = 1
    downsample_each_repeat: bool = False
    mid_squeeze: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mc: bool = False):
        stride = 2 if self.downsample else 1
        mid_ch = max(self.out_ch // self.mid_squeeze, 1)
        drop_off = not (train or mc)

        # skip over the whole stack
        if stride > 1 or self.in_ch != self.out_ch:
            identity = nn.Conv(
                self.out_ch, (1, 1), strides=(stride, stride), use_bias=False,
                dtype=self.dtype, kernel_init=conv_kernel_init, name="skip_conv",
            )(x)
            identity = BatchNorm(self.dtype)(identity, train)
        else:
            identity = x

        out = x
        for i in range(self.num_repeats):
            if self.downsample_each_repeat:
                b_stride = stride
            else:
                b_stride = stride if i == 0 else 1
            out = nn.Conv(
                mid_ch, (1, 1), strides=(b_stride, b_stride), use_bias=False,
                dtype=self.dtype, kernel_init=conv_kernel_init,
            )(out)
            out = BatchNorm(self.dtype)(out, train)
            out = nn.gelu(out, approximate=False)
            out = nn.Dropout(self.dropout, deterministic=drop_off)(out)
            out = nn.Conv(mid_ch, (3, 3), use_bias=False, dtype=self.dtype,
                          kernel_init=conv_kernel_init)(out)
            out = BatchNorm(self.dtype)(out, train)
            out = nn.gelu(out, approximate=False)
            out = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=conv_kernel_init)(out)
            out = BatchNorm(self.dtype)(out, train)

        # Serving fast path (gate DMF_FUSED_EPILOGUE=1): the whole epilogue
        # — residual add + GELU + (MC) dropout + SE — as ONE Pallas kernel:
        # 2 reads + 1 write of the feature map vs XLA's 3R+2W (the SE pool
        # co-fuses with the preceding elementwise, so fusing the SE alone
        # is a traffic wash; measured breakdown in ops/epilogue_pallas.py).
        # Params come from the same SEBlock child, so checkpoints/structure
        # are identical; no gradient flows through eval/mc forwards.
        # MC passes only: measured on-chip (scripts/bench_se.py, v5e) the
        # kernel wins 2.7-2.9x under the MC vmap (C=128: 31.9->12.0 ms,
        # C=256: 58.7->20.6 ms per 39 passes) but plain eval (drop=0,
        # unvmapped) REGRESSES at C=128 (1.7->17.9 ms): XLA's eval chain is
        # already one fusion there and the bt=8 grid can't hide the
        # per-tile latency without the folded pass axis filling the grid.
        if self.use_se and not train and not self.is_initializing():
            from ..ops import epilogue_pallas as ep

            mc_drop = mc and self.dropout > 0
            # the two cases are gated separately: the MC-vmap dispatch is a
            # measured default-on win; the drop-free eval dispatch (grid
            # marked parallel) measured an e2e LOSS both times it was tried
            # (fp serving 741 vs 766-771; re-measured with the layout-matched
            # variant 828.6 vs 857.8 — XLA co-fuses the eval chain into the
            # preceding conv) so it stays opt-in (DMF_FUSED_EPILOGUE_EVAL=1)
            gate = ep.enabled() if mc_drop else ep.enabled_eval()
            if (jax.default_backend() == "tpu" and gate
                    and out.ndim == 4 and ep.fits_vmem(out.shape, out.dtype)
                    and ep.channel_allowed(out.shape[-1])):
                drop = float(self.dropout) if mc_drop else 0.0
                rng = self.make_rng("dropout") if mc_drop else None
                se_p = self.get_variable("params", "se")
                out = ep.se_epilogue(
                    out, identity,
                    se_p["Dense_0"]["kernel"], se_p["Dense_0"]["bias"],
                    se_p["Dense_1"]["kernel"], se_p["Dense_1"]["bias"],
                    drop_rate=drop, rng=rng)
                if self.recon_ch > 0:
                    recon = ReconHead(self.out_ch, self.recon_ch,
                                      dtype=self.dtype,
                                      name="reconstruct")(out, train)
                    return out, recon
                return out, None

        out = nn.gelu(out + identity, approximate=False)
        out = nn.Dropout(self.dropout, deterministic=drop_off)(out)

        if self.use_se:
            # request the fused single-pass SE on the serving path (no
            # gradient flows through eval/mc forwards; training keeps the
            # XLA route; actual dispatch is behind the measured-win gate)
            out, _ = SEBlock(self.out_ch, self.se_reduction, self.dtype,
                             name="se")(out, fused=not train)

        recon = None
        if self.recon_ch > 0:
            recon = ReconHead(self.out_ch, self.recon_ch, dtype=self.dtype,
                              name="reconstruct")(out, train)
        return out, recon


class Projector(nn.Module):
    """Two 1x1 conv+BN+GELU stages to ``proj_dim`` channels.

    Reference: model_module.py:323-348 (mimic-loss projection heads).
    """

    proj_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = nn.Conv(self.proj_dim, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=conv_kernel_init)(x)
            x = BatchNorm(self.dtype)(x, train)
            x = nn.gelu(x, approximate=False)
        return x


class ClassificationHead(nn.Module):
    """Global pool -> flatten -> L2 normalize -> Linear.

    Reference: model_module.py:355-369 (note the L2 normalization before the
    final linear — load-bearing for the focal-loss dynamics).
    """

    num_classes: int
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = global_avg_pool(x)
        if self.normalize:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return nn.Dense(
            self.num_classes, dtype=self.dtype,
            kernel_init=linear_kernel_init,
        )(x)


class FeatureDownAlign(nn.Module):
    """Channel/stride alignment conv. Reference: model_module.py:371-396."""

    in_ch: int
    out_ch: int
    downsample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.in_ch == self.out_ch and not self.downsample:
            return x
        stride = 2 if self.downsample else 1
        k = 3 if self.downsample else 1
        pad = ((1, 1), (1, 1)) if self.downsample else "SAME"
        x = nn.Conv(self.out_ch, (k, k), strides=(stride, stride),
                    padding=pad, use_bias=False, dtype=self.dtype,
                    kernel_init=conv_kernel_init)(x)
        x = BatchNorm(self.dtype)(x, train)
        return nn.gelu(x, approximate=False)


class FusionReduce(nn.Module):
    """1x1 conv + BN + GELU channel reduction. Reference: model_module.py:782-794."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=conv_kernel_init)(x)
        x = BatchNorm(self.dtype)(x, train)
        return nn.gelu(x, approximate=False)

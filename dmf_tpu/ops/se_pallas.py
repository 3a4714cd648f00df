"""Fused squeeze-excitation Pallas kernel (TPU serving fast path).

The SE blocks are the measured HBM-bandwidth hotspot of serving: XLA cannot
fuse across the global-average-pool's full reduction, so each SE
materializes its (B, H, W, C) input and re-reads it for the pool and again
for the excitation multiply — profiled at ~24% of TTA x MC step time
(README perf table; reference counterpart model_module.py:25-47, the
``SEBlock`` inside every ResNetLiteBlock chain, model_module.py:220-316).

This kernel keeps one sample's full (H, W, C) feature map resident in VMEM
and does pool -> Dense -> GELU -> Dense -> sigmoid -> scale in a single
pass: exactly one HBM read and one write of the map (plus the tiny MLP
weights), instead of XLA's read(pool) + read(scale) + write.

Numerics: pool accumulates in fp32 and is cast back to the compute dtype
before the MLP (mirroring ``global_avg_pool`` + ``nn.Dense(dtype=...)``),
matmuls accumulate fp32 on the MXU, sigmoid/GELU in fp32.  Forward-only by
design — the training path keeps the differentiable XLA route
(models/layers.py::SEBlock dispatches on ``train``).  Parity with the XLA
SEBlock is pinned by tests/test_se_pallas.py (interpret mode on CPU).

VMEM budget: the (1, H, W, C) block + weights must fit ~16 MB double-
buffered; ``fits_vmem`` gates dispatch (largest flagship map: 64x64x256
bf16 = 2 MB — comfortably resident).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-sample block + in/out double buffering must stay well under 16 MB VMEM
_VMEM_BLOCK_LIMIT = 4 * 1024 * 1024


def fits_vmem(shape: Tuple[int, ...], dtype) -> bool:
    """Dispatch gate: per-sample block resident in VMEM AND lane-aligned
    channels (C % 128) so Mosaic tiles without padding waste.  The tiny
    modality-attention SEs (C=14/6) stay on the XLA path by this gate."""
    b, h, w, c = shape
    return (c % 128 == 0
            and h * w * c * jnp.dtype(dtype).itemsize <= _VMEM_BLOCK_LIMIT)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |err| <= 1.5e-7.

    Mosaic (jax 0.9 / libtpu 0.0.34) implements neither ``erf`` nor
    ``erfc`` as Pallas TPU primitives; the approximation error is ~4
    orders of magnitude below bf16 resolution, so the fused kernel stays
    numerically indistinguishable from the XLA exact-GELU path."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _se_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, s_ref,
               *, n_pix: int):
    x = x_ref[0]  # (H, W, C), one sample resident in VMEM
    H, W, C = x.shape
    flat = x.reshape(n_pix, C)
    # fp32-accumulated spatial mean, cast back like global_avg_pool + Dense
    pool = (flat.astype(jnp.float32).sum(axis=0, keepdims=True)
            / float(n_pix)).astype(x.dtype)  # (1, C)
    h = jnp.dot(pool, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # exact GELU via _erf: jax.nn.gelu(approximate=False) lowers through
    # erfc, which Mosaic doesn't implement (nor erf)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    s = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    s = jax.nn.sigmoid(s + b2_ref[...].astype(jnp.float32))  # (1, C) fp32
    out_ref[0] = (flat.astype(jnp.float32) * s).reshape(H, W, C).astype(x.dtype)
    s_ref[0] = s.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def se_scale(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
             w2: jnp.ndarray, b2: jnp.ndarray,
             interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused SE: returns ``(x * sigmoid(mlp(pool(x))), weights (B,1,1,C))``.

    ``x``: (B, H, W, C); ``w1``: (C, mid); ``w2``: (mid, C).  The returned
    weight map matches ``SEBlock``'s second output shape.
    """
    B, H, W, C = x.shape
    mid = w1.shape[1]
    b1 = b1.reshape(1, mid)
    b2 = b2.reshape(1, C)
    out, s = pl.pallas_call(
        functools.partial(_se_kernel, n_pix=H * W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, C) not (B, C): Mosaic requires the block's trailing two
            # dims to be (8, 128)-divisible OR equal to the array's — a
            # (1, C) row of a (B, C) array is neither when B > 1
            pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), x.dtype),
        ],
        interpret=interpret,
    )(x, w1.astype(x.dtype), b1.astype(x.dtype),
      w2.astype(x.dtype), b2.astype(x.dtype))
    return out, s[:, :, None, :]

"""Attention primitives: XLA reference path + Pallas flash kernel dispatch.

Replaces the reference's hand-rolled MHSA (transformer_model.py:83-116) and
``nn.MultiheadAttention`` cross-attention (model_module.py:799-818).  The
public entry point is :func:`scaled_dot_product_attention`, which routes to a
blocked Pallas flash-attention kernel on TPU for large token counts and to a
fused XLA einsum path otherwise (16-token cross-attention would be all
overhead in a custom kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    # q,k,v: (B, H, N, D)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    return out, weights


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    return_weights: bool = False,
    use_pallas: Optional[bool] = None,
):
    """Multi-head attention over (B, H, N, D) tensors.

    Returns ``out`` or ``(out, weights)``.  The Pallas path never
    materializes the (N, N) weight matrix, so ``return_weights`` forces the
    XLA path.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if use_pallas is None:
        # alignment must match flash_attention's ACTUAL block requirement:
        # N % block_q and N % block_k with blocks clamped to N — i.e.
        # N % 512 for N >= 512 (N=2304 is %128-aligned but %512 == 256 and
        # would raise inside the kernel)
        from .flash_attention import DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q
        from .kernel_gates import flag

        n = q.shape[-2]
        use_pallas = (
            not return_weights
            and n >= 512
            and n == k.shape[-2]
            and n % min(DEFAULT_BLOCK_Q, n) == 0
            and n % min(DEFAULT_BLOCK_K, n) == 0
            and jax.default_backend() == "tpu"
        )
        # knob (DMF_FLASH_ATTN / ServingKernelConfig.flash_attention):
        # False forces the XLA path for A/B sweeps; True only ALLOWS
        # dispatch — the shape-legality conditions above still bind
        gate = flag("DMF_FLASH_ATTN", "flash_attention")
        if gate is False:
            use_pallas = False

    if use_pallas:
        from .flash_attention import flash_attention

        out = flash_attention(q, k, v, scale=scale)
        return (out, None) if return_weights else out

    out, weights = _xla_attention(q, k, v, scale)
    return (out, weights) if return_weights else out

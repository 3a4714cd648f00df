"""Blocked flash-attention Pallas kernel for TPU.

Replaces the reference's materialized (N, N) softmax attention
(transformer_model.py:107-111) for the hybrid-transformer stage, whose
default geometry is 4096 tokens x 512 embed / 4 heads (input 256 -> f2 at
128^2 -> patchify 2).  Online-softmax over key blocks: the (N, N) weight
matrix never exists, VMEM holds one (BQ, D) query tile plus (BK, D) k/v
tiles, and every matmul lands on the MXU with fp32 accumulation.

Numerics: exact (not approximate) softmax attention; validated against the
XLA einsum path in tests/test_flash_attention.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int,
                  seq_len_k: int):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    block_q, d = q.shape
    num_kb = seq_len_k // block_k

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l

    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Attention over (B, H, N, D) tensors (self- or cross-shaped).

    Requires N_q % block_q == 0 and N_k % block_k == 0 after clamping the
    block sizes to the sequence lengths (the dispatcher only routes aligned
    shapes here).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    B, H, NQ, D = q.shape
    NK = k.shape[-2]
    block_q = min(block_q, NQ)
    block_k = min(block_k, NK)
    if NQ % block_q or NK % block_k:
        raise ValueError(f"unaligned seq lens ({NQ}, {NK}) for blocks "
                         f"({block_q}, {block_k})")

    qf = q.reshape(B * H, NQ, D)
    kf = k.reshape(B * H, NK, D)
    vf = v.reshape(B * H, NK, D)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, seq_len_k=NK
    )
    grid = (B * H, NQ // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NK, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NK, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, NQ, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * NQ * NK * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=B * H * NQ * NK,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, NQ, D)

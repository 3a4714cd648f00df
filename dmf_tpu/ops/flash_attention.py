"""Blocked flash-attention Pallas kernels (forward + backward) for TPU.

Replaces the reference's materialized (N, N) softmax attention
(transformer_model.py:107-111) for the hybrid-transformer stage, whose
default geometry is 4096 tokens x 512 embed / 4 heads (input 256 -> f2 at
128^2 -> patchify 2).  Online-softmax over key blocks: the (N, N) weight
matrix never exists, VMEM holds one (BQ, D) query tile plus (BK, D) k/v
tiles, and every matmul lands on the MXU with fp32 accumulation.

Training support: :func:`flash_attention` carries a ``jax.custom_vjp``
whose backward is the standard two-pass recompute scheme (FlashAttention-2,
Dao 2023): the forward additionally emits the per-row logsumexp, and the
backward re-materializes each probability tile from (q, k, lse) instead of
storing it — dQ in one kernel over query tiles, dK/dV in a second over key
tiles.  The reference trains this attention in torch autograd
(transformer_model.py:83-116); this is the TPU-native equivalent.

Mosaic constraints honored (see CLAUDE.md): all dot_generals contract a
single dimension, and no lane-moving reshapes/transposes — the logsumexp
and delta rows are carried as (N, 1) columns so every broadcast is along
lanes.

Numerics: exact (not approximate) softmax attention; forward and backward
validated against the XLA einsum path in tests/test_pallas_kernels.py.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                  block_k: int, seq_len_k: int):
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
    lse_ref[0] = m + jnp.log(l)  # (BQ, 1)


def _flash_forward(q, k, v, scale, block_q, block_k):
    """Returns (out, lse) over flattened (BH, N, D) operands."""
    BH, NQ, D = q.shape
    NK = k.shape[-2]
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, seq_len_k=NK
    )
    grid = (BH, NQ // block_q)
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, NQ, D), q.dtype),
            jax.ShapeDtypeStruct((BH, NQ, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * NQ * NK * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=BH * NQ * NK,
        ),
    )(q, k, v)
    return out, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float, block_k: int, seq_len_k: int):
    q = q_ref[0].astype(jnp.float32)       # (BQ, D)
    do = do_ref[0].astype(jnp.float32)     # (BQ, D)
    lse = lse_ref[0].astype(jnp.float32)   # (BQ, 1)
    delta = delta_ref[0].astype(jnp.float32)  # (BQ, 1)
    num_kb = seq_len_k // block_k

    def body(i, acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                               # (BQ, BK)
        p = jnp.exp(s - lse)                    # recomputed softmax tile
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # (BQ, BK)
        ds = p * (dp - delta) * scale
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, num_kb, body, jnp.zeros_like(q))
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float, block_q: int,
                    seq_len_q: int):
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0].astype(jnp.float32)  # (BK, D)
    num_qb = seq_len_q // block_q

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                               # (BQ, BK)
        p = jnp.exp(s - lse)
        # dv += p^T @ do (contract the BQ axis of both — no transpose needed)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # (BQ, BK)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, num_qb, body,
        (jnp.zeros_like(k), jnp.zeros_like(v)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, do, scale, block_q, block_k):
    BH, NQ, D = q.shape
    NK = k.shape[-2]
    # per-row dO.O — cheap elementwise+reduce, let XLA fuse it
    delta = (do.astype(jnp.float32) * out.astype(jnp.float32)).sum(
        axis=-1, keepdims=True
    )  # (BH, NQ, 1)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          seq_len_k=NK),
        grid=(BH, NQ // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NK, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NK, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, NQ, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * NQ * NK * D,
            bytes_accessed=(q.size + k.size + v.size + do.size)
            * q.dtype.itemsize,
            transcendentals=BH * NQ * NK,
        ),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          seq_len_q=NQ),
        grid=(BH, NK // block_k),
        in_specs=[
            pl.BlockSpec((1, NQ, D), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ, D), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ, 1), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ, 1), lambda bh, ki: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda bh, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, NK, D), k.dtype),
            jax.ShapeDtypeStruct((BH, NK, D), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * NQ * NK * D,
            bytes_accessed=(q.size + k.size + v.size + do.size)
            * q.dtype.itemsize,
            transcendentals=BH * NQ * NK,
        ),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, block_q, block_k):
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k)
    return out


def _flash_attention_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd(scale, block_q, block_k, residuals, do):
    q, k, v, out, lse = residuals
    return _flash_backward(q, k, v, out, lse, do, scale, block_q, block_k)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


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

    Differentiable: carries a custom VJP whose backward runs the two
    recompute Pallas kernels above.  Requires N_q % block_q == 0 and
    N_k % block_k == 0 after clamping the block sizes to the sequence
    lengths (the dispatcher only routes aligned shapes here).
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
    out = _flash_attention(qf, kf, vf, float(scale), block_q, block_k)
    return out.reshape(B, H, NQ, D)

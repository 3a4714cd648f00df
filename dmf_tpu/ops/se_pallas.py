"""Fused squeeze-excitation Pallas kernel (TPU serving fast path).

The SE blocks are the measured HBM-bandwidth hotspot of serving: XLA cannot
fuse across the global-average-pool's full reduction, so each SE
materializes its (B, H, W, C) input and re-reads it for the pool and again
for the excitation multiply — profiled at ~24% of TTA x MC step time
(README perf table; reference counterpart model_module.py:25-47, the
``SEBlock`` inside every ResNetLiteBlock chain, model_module.py:220-316).

This kernel keeps a TILE of samples' full (H, W, C) feature maps resident
in VMEM and does pool -> Dense -> GELU -> Dense -> sigmoid -> scale in a
single pass: exactly one HBM read and one write of the map (plus the tiny
MLP weights), instead of XLA's read(pool) + read(scale) + write.

Two design points matter for the grid, both measured on the v5e (a first
cut with ``grid=(B,)`` and one sample per step REGRESSED serving 768->745
vol/s and TTA x MC 87->70 — per-step overhead swamped the saved traffic):

* **Batch-tiled grid.** Each grid step processes ``bt`` samples (the
  largest divisor of B whose tile fits the VMEM block budget), so the MLP
  matmuls are (bt, C) x (C, mid) instead of single-row, and per-step
  launch/DMA-setup overhead is amortized bt-fold.
* **custom_vmap: the MC-pass axis folds into the batch.** ``jax.vmap`` of
  a ``pallas_call`` prepends a *sequential* grid dimension — under the
  40-pass MC ensemble that multiplied the number of tiny grid steps 40x.
  The ``jax.custom_batching.custom_vmap`` rule instead reshapes
  (P, B, H, W, C) -> (P*B, H, W, C) and re-enters the kernel with the
  bigger batch: same bytes, bt-sample tiles, no extra grid axis.

Single-device serving only: a Pallas custom call does not auto-partition
under GSPMD, so the sharded (mesh) serving path keeps the XLA route — wrap
in ``shard_map`` before enabling the gate on a sharded predictor.

Numerics: pool accumulates in fp32 and is cast back to the compute dtype
before the MLP (mirroring ``global_avg_pool`` + ``nn.Dense(dtype=...)``),
matmuls accumulate fp32 on the MXU, sigmoid/GELU in fp32.  Forward-only by
design — the training path keeps the differentiable XLA route
(models/layers.py::SEBlock dispatches on ``train``).  Parity with the XLA
SEBlock is pinned by tests/test_se_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_gates

# per-grid-step tile + in/out double buffering must stay well under VMEM
_VMEM_BLOCK_LIMIT = 4 * 1024 * 1024
# Mosaic's default scoped-VMEM budget is 16 MB; in+out double-buffered
# 4 MB tiles plus the kernel's fp32 temporaries overflow it by 64 KB on
# the v5e (128 MB physical VMEM), so raise the per-kernel cap explicitly.
_VMEM_KERNEL_LIMIT = 64 * 1024 * 1024


def enabled() -> bool:
    """Measured-win gate for the serving dispatch (models/layers.py).

    Default OFF: the first-cut per-sample-grid kernel regressed end-to-end
    serving on the v5e (fp 768->745, TTA x MC 87->70 vol/s) — per-step grid
    overhead swamped the saved HBM traffic.  Set ``DMF_FUSED_SE=1`` to
    dispatch the batch-tiled rewrite; flip the default only with an on-chip
    measurement (scripts/bench_se.py) showing it wins at the flagship
    geometries AND an end-to-end bench.py confirmation.
    """
    f = kernel_gates.flag("DMF_FUSED_SE", "fused_se")
    return False if f is None else f


def fits_vmem(shape: Tuple[int, ...], dtype) -> bool:
    """Dispatch gate: per-sample block resident in VMEM AND lane-aligned
    channels (C % 128) so Mosaic tiles without padding waste.  The tiny
    modality-attention SEs (C=14/6) stay on the XLA path by this gate."""
    b, h, w, c = shape
    return (c % 128 == 0
            and h * w * c * jnp.dtype(dtype).itemsize <= _VMEM_BLOCK_LIMIT)


def _batch_tile(b: int, per_sample_bytes: int,
                budget: int = _VMEM_BLOCK_LIMIT) -> int:
    """Largest divisor of ``b`` whose tile fits the VMEM block budget."""
    bt = max(1, min(b, budget // max(per_sample_bytes, 1)))
    while b % bt:
        bt -= 1
    return bt


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
    x = x_ref[...]  # (bt, H, W, C), a tile of samples resident in VMEM
    bt, H, W, C = x.shape
    flat = x.reshape(bt, n_pix, C)
    # fp32-accumulated spatial mean, cast back like global_avg_pool + Dense
    pool = (flat.astype(jnp.float32).sum(axis=1)
            / float(n_pix)).astype(x.dtype)  # (bt, C)
    h = jnp.dot(pool, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # exact GELU via _erf: jax.nn.gelu(approximate=False) lowers through
    # erfc, which Mosaic doesn't implement (nor erf)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    s = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    s = jax.nn.sigmoid(s + b2_ref[...].astype(jnp.float32))  # (bt, C) fp32
    out_ref[...] = (flat.astype(jnp.float32) * s[:, None, :]
                    ).reshape(bt, H, W, C).astype(x.dtype)
    s_ref[...] = s[:, None, :].astype(x.dtype)  # (bt, 1, C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _se_pallas(x, w1, b1, w2, b2, interpret=False):
    B, H, W, C = x.shape
    mid = w1.shape[1]
    bt = _batch_tile(B, H * W * C * jnp.dtype(x.dtype).itemsize)
    out, s = pl.pallas_call(
        functools.partial(_se_kernel, n_pix=H * W),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
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
            pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, C) not (B, C): Mosaic requires the block's trailing two
            # dims to be (8, 128)-divisible OR equal to the array's — a
            # (bt, C) row-tile of a (B, C) array is neither when bt < B
            pl.BlockSpec((bt, 1, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # batch tiles are independent
            vmem_limit_bytes=_VMEM_KERNEL_LIMIT,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)
    return out, s


def _make_se_fn(interpret: bool):
    @jax.custom_batching.custom_vmap
    def fn(x, w1, b1, w2, b2):
        return _se_pallas(x, w1, b1, w2, b2, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, w1, b1, w2, b2):  # noqa: ANN001
        x_b, *w_b = in_batched
        if not x_b or any(w_b):
            # not our serving pattern (weights must be shared across the
            # mapped axis); evaluate per-slice to stay correct
            args = tuple(
                a if bb else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, bb in zip((x, w1, b1, w2, b2), in_batched)
            )
            out, s = jax.lax.map(lambda t: fn(*t), args)
            return (out, s), (True, True)
        P = axis_size
        B, H, W, C = x.shape[1:]
        # fold the mapped axis (MC passes) into the batch: same bytes, no
        # extra sequential grid dimension
        out, s = fn(x.reshape(P * B, H, W, C), w1, b1, w2, b2)
        return (out.reshape(P, B, H, W, C), s.reshape(P, B, 1, C)), (True, True)

    return fn


_SE_FN = {False: _make_se_fn(False), True: _make_se_fn(True)}


def se_scale(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
             w2: jnp.ndarray, b2: jnp.ndarray,
             interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused SE: returns ``(x * sigmoid(mlp(pool(x))), weights (B,1,1,C))``.

    ``x``: (B, H, W, C); ``w1``: (C, mid); ``w2``: (mid, C).  The returned
    weight map matches ``SEBlock``'s second output shape.
    """
    B, H, W, C = x.shape
    mid = w1.shape[1]
    out, s = _SE_FN[bool(interpret)](
        x, w1.astype(x.dtype), b1.reshape(1, mid).astype(x.dtype),
        w2.astype(x.dtype), b2.reshape(1, C).astype(x.dtype))
    return out, s[:, :, None, :]

"""EXPERIMENTAL Pallas preprocessing kernel: DWI per-channel z-score.

NOT the production path — ``data/preprocess.py::dwi_normalize`` (XLA) is.
Measured on v5e at the serving geometry (128, 256, 256, 14) fp32: this
whole-image-per-block design does not fit VMEM — the (256,256,14) block is
3.67 MB, double-buffered in+out ~15 MB, plus ~32 MB of register-allocator
spill slots for the fused reduction, exceeding the 16 MB VMEM budget
(RESOURCE_EXHAUSTED at compile).  A production version needs a two-pass
tiled reduction (row-tile partial sums -> rescale pass), which XLA's fusion
of the same computation already approximates well; the XLA path measured
within noise of HBM speed-of-light, so the extra kernel complexity isn't
paid for.  Kept as a tested reference for the Pallas reduction pattern at
small geometries.  Numerics match the reference formula (dataset.py:14-41)
with unbiased std.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dwi_norm_kernel(x_ref, o_ref, *, z_lo: float, z_hi: float,
                     skip_last: bool, zero_last: bool, n_pix: int):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    H, W, C = x.shape
    flat = x.reshape(n_pix, C)
    mean = flat.mean(axis=0, keepdims=True)
    # unbiased (ddof=1) to match torch Tensor.std (dataset.py:29)
    var = ((flat - mean) ** 2).sum(axis=0, keepdims=True) / (n_pix - 1)
    std = jnp.maximum(jnp.sqrt(var), 1e-6)
    z = jnp.clip((flat - mean) / std, z_lo, z_hi)
    out = (z - z_lo) / (z_hi - z_lo)
    if skip_last:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_pix, C), 1)
        last_val = jnp.zeros_like(flat) if zero_last else flat
        out = jnp.where(col_ids == C - 1, last_val, out)
    o_ref[0] = out.reshape(H, W, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("clip_z", "skip_last", "zero_last")
)
def dwi_normalize_pallas(
    imgs: jnp.ndarray,
    clip_z: Tuple[float, float] = (-3.0, 3.0),
    skip_last: bool = True,
    zero_last: bool = False,
) -> jnp.ndarray:
    """Batched (N, H, W, C) fused z-score normalize on TPU."""
    N, H, W, C = imgs.shape
    kernel = functools.partial(
        _dwi_norm_kernel, z_lo=clip_z[0], z_hi=clip_z[1],
        skip_last=skip_last, zero_last=zero_last, n_pix=H * W,
    )
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(imgs.shape, imgs.dtype),
    )(imgs)

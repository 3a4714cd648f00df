"""Pallas histogram-percentile kernel for Nyul standardization (EXPERIMENTAL).

STATUS: blocked on Mosaic limitations, three formulations tried on this
stack (jax 0.9 / libtpu 0.0.34):
  * (rows, lane) -> (pixels, 1) shape cast: "infer-vector-layout:
    unsupported shape cast";
  * (R, L, SUB) -> (R*L, SUB) merge reshape: same;
  * dot_general with two contracting dims: "tpu.matmul lhs contracting
    dims must be of size 1".
The production path uses data/preprocess.py::nyul_transform_fast (fused
two-round CDF counting, ~100x over the sort-based baseline, ~0.22 ms/volume
= ~7% of the e2e inference budget), so the remaining headroom is small;
this kernel is kept as the design sketch for a future Mosaic version.

The Nyul transform needs 11 exact-ish per-image per-channel percentiles
(preprocess_helpers.py:103).  Sorting on TPU is catastrophically slow and
the fused-XLA two-round counter still costs ~60ms/batch; this kernel builds
a 4096-bin histogram per (image, channel) entirely in VMEM using chunked
one-hot matmuls on the MXU — hist(64x64) += onehot_hi(P_c, 64)^T @
onehot_lo(P_c, 64) — then reads the percentiles off the in-register CDF.
One HBM pass over the pixels, ~batched-matmul speed.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 64  # hist is (SUB, SUB) = 4096 bins
CHUNK_ROWS = 64  # pixels processed per inner step: CHUNK_ROWS * LANE


def _percentile_kernel(x_ref, tgt_ref, out_ref, *, n_targets: int,
                       n_pix: int, lane: int):
    x = x_ref[0].astype(jnp.float32)  # (rows, lane)
    rows = x.shape[0]
    mn = x.min()
    mx = x.max()
    span = jnp.maximum(mx - mn, 1e-12)
    nbins = SUB * SUB

    # Mosaic iota must be integer-typed; cast afterwards.  Built 3D so the
    # one-hot compare broadcasts without reshaping the lane dim (Mosaic
    # rejects shape casts that move lane elements into sublanes).
    sub_iota3 = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK_ROWS, lane, SUB), 2
    ).astype(jnp.float32)

    def chunk_hist(i, hist):
        # dynamic slice must go through the ref (Pallas TPU restriction)
        chunk = x_ref[0, pl.ds(i * CHUNK_ROWS, CHUNK_ROWS), :].astype(
            jnp.float32
        )  # (R, L)
        idx = jnp.clip((chunk - mn) / span * nbins, 0, nbins - 1)
        hi = jnp.floor(idx / SUB)[..., None]  # (R, L, 1)
        lo = (jnp.floor(idx) - jnp.floor(idx / SUB) * SUB)[..., None]
        # 3D one-hots, contracted over both pixel dims at once (avoids any
        # reshape, which Mosaic's layout inference rejects here)
        oh_hi = (hi == sub_iota3).astype(jnp.float32)  # (R, L, SUB)
        oh_lo = (lo == sub_iota3).astype(jnp.float32)
        return hist + jax.lax.dot_general(
            oh_hi, oh_lo, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    hist = jax.lax.fori_loop(
        0, rows // CHUNK_ROWS, chunk_hist, jnp.zeros((SUB, SUB), jnp.float32)
    )

    # CDF over the flattened 4096 bins.  Pallas TPU has no cumsum primitive;
    # express it as matmuls with a triangular ones matrix (MXU-friendly):
    # row_cum = hist @ UT where UT[k, j] = 1 iff k <= j.
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    upper = (r <= c).astype(jnp.float32)  # (SUB, SUB)
    row_cum = jax.lax.dot_general(
        hist, upper, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row_tot = row_cum[:, SUB - 1 :]
    tot_cum = jax.lax.dot_general(
        upper, row_tot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # inclusive cumsum over rows
    offsets = tot_cum - row_tot
    cdf = row_cum + offsets  # (SUB, SUB) == cdf of flat bins

    flat_cdf = cdf.reshape(1, nbins)
    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (1, nbins), 1).astype(
        jnp.float32
    )
    g = pl.program_id(0)
    L = n_targets
    tgt = (tgt_ref[:] * (n_pix - 1) + 1.0).reshape(L, 1)
    bin_idx = jnp.sum(
        (flat_cdf < tgt).astype(jnp.float32), axis=-1, keepdims=True
    )  # (L, 1)
    bin_idx = jnp.clip(bin_idx, 0.0, nbins - 1.0)
    # counts below / inside the selected bin via masked reductions
    # (no dynamic gather: select by comparing iota to the index)
    sel = (bin_iota == bin_idx).astype(jnp.float32)  # (L, nbins)
    prev = (bin_iota == jnp.maximum(bin_idx - 1.0, 0.0)).astype(jnp.float32)
    c_hi = jnp.sum(flat_cdf * sel, axis=-1, keepdims=True)
    c_lo = jnp.where(
        bin_idx > 0,
        jnp.sum(flat_cdf * prev, axis=-1, keepdims=True),
        0.0,
    )
    frac = jnp.clip((tgt - c_lo) / jnp.maximum(c_hi - c_lo, 1.0), 0.0, 1.0)
    vals = mn + (bin_idx + frac) / nbins * span  # (L, 1)
    out_ref[pl.ds(g, 1), :] = vals.reshape(1, L)


@functools.partial(jax.jit, static_argnames=("percents",))
def histogram_percentiles_pallas(
    flat: jnp.ndarray,  # (G, P) — one row per (image, channel)
    percents: Tuple[float, ...],
) -> jnp.ndarray:
    """Per-row percentiles (percents in [0,100]) -> (G, L)."""
    G, P = flat.shape
    lane = 128
    rows = P // lane
    if P % lane or rows % CHUNK_ROWS:
        raise ValueError(f"P={P} must be a multiple of {lane * CHUNK_ROWS}")
    x = flat.reshape(G, rows, lane)
    L = len(percents)
    tgt_arr = jnp.asarray([p / 100.0 for p in percents],
                          jnp.float32).reshape(1, L)
    kernel = functools.partial(
        _percentile_kernel, n_targets=L, n_pix=P, lane=lane
    )
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, rows, lane), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, L), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        # full-array output block (TPU tiling disallows (1, L) blocks);
        # each program writes its own disjoint row via program_id
        out_specs=pl.BlockSpec((G, L), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * P * 2 * SUB,
            bytes_accessed=flat.size * 4,
            transcendentals=0,
        ),
    )(x, tgt_arr)


def nyul_transform_pallas(
    img: jnp.ndarray,  # (B, H, W, C) or (H, W, C)
    landmark_percents: Sequence[float],
    standard_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Full Nyul transform with Pallas percentiles + fused piecewise map."""
    from ..data.preprocess import _piecewise_map

    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    B, H, W, C = img.shape
    flat = img.transpose(0, 3, 1, 2).reshape(B * C, H * W)
    perc = histogram_percentiles_pallas(
        flat, tuple(float(p) for p in landmark_percents)
    )  # (B*C, L)
    out = jax.vmap(_piecewise_map)(flat, perc,
                                   jnp.broadcast_to(standard_scale,
                                                    (B * C,) + standard_scale.shape))
    out = out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    return out[0] if squeeze else out

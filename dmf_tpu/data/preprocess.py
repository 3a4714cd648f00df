"""Preprocessing kernels — pure, jittable, channels-last (NHWC).

TPU-native re-implementations of the reference preprocessing
(dataset.py:9-53, preprocess_helpers.py:27-167, prepare_single_model.py:311-343).
All hot paths are expressible as one fused XLA program over batched volumes —
measured within noise of HBM speed-of-light at the serving geometry, so these
XLA kernels ARE the production path.  (``dmf_tpu.ops.preprocess_pallas`` is a
documented-experimental Pallas study of the same normalizer: it doesn't fit
VMEM at serving geometry and is kept only as a reduction-pattern reference —
see its module docstring for the measurements.)
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nyul_stride_default() -> int:
    """Serving-wide default for Nyul percentile subsampling.

    ``DMF_NYUL_STRIDE=k`` (or ``Config.serving_kernels.nyul_stride`` via
    the gate registry) estimates each image's landmark percentiles from
    every k-th pixel (the transform still maps every pixel).  Unset -> 1
    (every pixel; exact rank statistics).  See ``nyul_transform_fast``.
    """
    from dmf_tpu.ops import kernel_gates

    v = kernel_gates.integer("DMF_NYUL_STRIDE", "nyul_stride")
    return max(v if v is not None else 1, 1)

# ---------------------------------------------------------------------------
# DWI per-channel z-score normalization (dataset.py:9-41)
# ---------------------------------------------------------------------------


def dwi_normalize(
    img: jnp.ndarray,
    clip_z: Tuple[float, float] = (-3.0, 3.0),
    skip_last: bool = True,
    zero_last: bool = False,
) -> jnp.ndarray:
    """Per-image, per-channel z-score -> clip -> rescale to [0, 1].

    ``img``: (..., H, W, C).  ``skip_last`` leaves the last channel
    un-normalized (the reference reserves it for the ADC map,
    dataset.py:20-22).  ``zero_last=True`` reproduces the reference's
    *effective* behavior exactly: ``DWINormalize`` runs before the ADC
    channel is concatenated (dataset.py:77-88), so "the last channel" it
    skips is really the 13th b-value — and because it writes into
    ``torch.zeros_like`` without copying that channel, the 13th b-value is
    zeroed in every training image.  Used when cfg.reference_compat.
    """
    z_lo, z_hi = clip_z
    mean = img.mean(axis=(-3, -2), keepdims=True)
    # ddof=1 matches torch's unbiased ``Tensor.std()`` (dataset.py:29)
    std = jnp.clip(img.std(axis=(-3, -2), keepdims=True, ddof=1), 1e-6, None)
    z = jnp.clip((img - mean) / std, z_lo, z_hi)
    out = (z - z_lo) / (z_hi - z_lo)
    if skip_last:
        last = jnp.zeros_like(img[..., -1:]) if zero_last else img[..., -1:]
        out = jnp.concatenate([out[..., :-1], last], axis=-1)
    return out


# ---------------------------------------------------------------------------
# ADC map (preprocess_helpers.py:27-49, 133-167)
# ---------------------------------------------------------------------------


def compute_adc_map(
    dwi_imgs: jnp.ndarray, bvals: Sequence[float], eps: float = 1e-6
) -> jnp.ndarray:
    """Closed-form log-linear ADC fit over the b-value (channel) axis.

    ``dwi_imgs``: (..., H, W, C) with C b-value channels.
    Returns (..., H, W, 1).  Reference: preprocess_helpers.py:133-167
    (ADC = -slope, slope = Cov(b, logS)/Var(b)).
    """
    b = jnp.asarray(bvals, dtype=jnp.float32)
    logS = jnp.log(jnp.clip(dwi_imgs, eps, None))
    mean_b = b.mean()
    mean_logS = logS.mean(axis=-1, keepdims=True)
    db = b - mean_b
    cov = (db * (logS - mean_logS)).sum(axis=-1)
    var = (db**2).sum()
    slope = cov / (var + eps)
    return (-slope)[..., None]


def preprocess_adc(adc_map: jnp.ndarray) -> jnp.ndarray:
    """log1p compression then clamp to [0, 3e-3] and rescale.

    Reference: preprocess_helpers.py:33-49.
    """
    adc = jnp.log1p(jnp.clip(adc_map, 0.0, None))
    return jnp.clip(adc, 0.0, 3e-3) / 3e-3


def zero_to_one_adc(
    adc_map: jnp.ndarray, adc_min: float, adc_max: float
) -> jnp.ndarray:
    """Reference: preprocess_helpers.py:27-31."""
    adc = (adc_map - adc_min) / (adc_max - adc_min + 1e-8)
    return jnp.clip(adc, 0.0, 1.0)


# ---------------------------------------------------------------------------
# DCE global max normalization (prepare_single_model.py:337-343)
# ---------------------------------------------------------------------------


def dce_global_max_normalize(imgs: jnp.ndarray) -> jnp.ndarray:
    """Per-sample division by the global (all channels/pixels) max.

    ``imgs``: (N, H, W, C).
    """
    mx = imgs.reshape(imgs.shape[0], -1).max(axis=1)
    return imgs / mx[:, None, None, None]


# ---------------------------------------------------------------------------
# Nyúl histogram standardization (preprocess_helpers.py:52-131)
# ---------------------------------------------------------------------------

DEFAULT_LANDMARKS = (1, 10, 25, 30, 40, 50, 60, 75, 80, 90, 99)


class NyulStandardizer:
    """Percentile-landmark intensity standardization for DCE.

    ``fit`` runs once on the host (numpy); ``transform`` is a pure jittable
    function (double ``jnp.interp`` per channel — the reference's per-image
    Python loop, preprocess_helpers.py:97-114, becomes one vmapped XLA call).
    """

    def __init__(
        self,
        landmarks: Sequence[float] = DEFAULT_LANDMARKS,
        target_range: Tuple[float, float] = (0.0, 1.0),
    ):
        self.landmarks = np.asarray(landmarks, dtype=np.float64)
        self.standard_scale = np.linspace(
            target_range[0], target_range[1], len(landmarks)
        )
        self.channel_landmarks: Optional[np.ndarray] = None  # (C, L)
        self.fitted = False

    # -- host-side ---------------------------------------------------------
    def fit(self, images: np.ndarray, num_channels: Optional[int] = None) -> None:
        """Average per-channel landmark percentiles over the training set.

        ``images``: (N, H, W, C).  Reference: preprocess_helpers.py:65-83.
        """
        images = np.asarray(images)
        C = num_channels or images.shape[-1]
        # native threaded path (nth_element per landmark, no full sorts)
        from ..utils.native import nyul_fit as native_nyul_fit

        native = native_nyul_fit(images[..., :C], self.landmarks)
        if native is not None:
            self.channel_landmarks = native
        else:
            # numpy fallback: percentiles per (sample, channel)
            flat = images.reshape(images.shape[0], -1, C)
            perc = np.percentile(flat, self.landmarks, axis=1)  # (L, N, C)
            self.channel_landmarks = perc.mean(axis=1).T[:C]  # (C, L)
        self.fitted = True

    def save(self, path: str) -> None:
        np.save(
            path,
            {
                "channel_landmarks": {
                    c: self.channel_landmarks[c]
                    for c in range(self.channel_landmarks.shape[0])
                },
                "fitted": self.fitted,
            },
        )

    def load(self, path: str) -> None:
        data = np.load(path, allow_pickle=True).item()
        lm: Dict[int, np.ndarray] = data["channel_landmarks"]
        self.channel_landmarks = np.stack([lm[c] for c in sorted(lm)], axis=0)
        self.fitted = data["fitted"]

    # -- device-side -------------------------------------------------------
    def transform(self, img: jnp.ndarray, fast: Optional[bool] = None,
                  percentile_stride: Optional[int] = None) -> jnp.ndarray:
        """Standardize one image or a batch, (..., H, W, C) -> same shape.

        Per channel: map image-specific landmark percentiles to the fitted
        averages, then map those to the standard [0,1] scale (double interp,
        preprocess_helpers.py:103-114).  Note: because both stages are
        monotone piecewise-linear with matching knots, the fitted averages
        cancel exactly — the output equals ``interp(x, orig_perc,
        standard_scale)``; a latent property of the reference algorithm that
        the fast path exploits.

        ``fast``: use the histogram percentile estimator + fused piecewise
        map (default: on for TPU backends, off on CPU for bit-exactness).
        ``percentile_stride``: estimate per-image landmarks from every k-th
        pixel (fast path only; default ``DMF_NYUL_STRIDE`` env or 1).
        """
        if not self.fitted:
            raise RuntimeError("Call fit() first")
        if fast is None:
            fast = jax.default_backend() != "cpu"
        if percentile_stride is None:
            percentile_stride = nyul_stride_default()
        kw = {"percentile_stride": percentile_stride} if fast else {}
        fn = nyul_transform_fast if fast else nyul_transform
        return fn(
            img,
            jnp.asarray(self.channel_landmarks, dtype=jnp.float32),
            jnp.asarray(self.landmarks, dtype=jnp.float32),
            jnp.asarray(self.standard_scale, dtype=jnp.float32),
            **kw,
        )

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        return self.transform(img)


def _nyul_channel(x, orig_perc, avg_perc, standard_scale):
    mid = jnp.interp(x, orig_perc, avg_perc)
    return jnp.interp(mid, avg_perc, standard_scale)


def _piecewise_map(x, knots_x, knots_y):
    """Monotone piecewise-linear map without searchsorted.

    For increasing knots, y(x) = y0 + sum_i (y_{i+1}-y_i) *
    clip((x-x_i)/(x_{i+1}-x_i), 0, 1) — every segment is a VPU-friendly
    clip/multiply, no gathers.  Exactly equals np.interp's clamped behavior.
    """
    x0 = knots_x[:-1]
    dx = jnp.maximum(knots_x[1:] - x0, 1e-12)
    dy = knots_y[1:] - knots_y[:-1]
    t = jnp.clip((x[..., None] - x0) / dx, 0.0, 1.0)
    return knots_y[0] + (t * dy).sum(axis=-1)


def _histogram_percentiles(
    flat: jnp.ndarray,  # (P, C)
    q: jnp.ndarray,  # (L,) percentiles in [0, 100]
    bins: int = 128,
) -> jnp.ndarray:
    """Approximate per-channel percentiles, sort-free and fusion-friendly.

    TPU sorts are the pipeline's hidden cost (jnp.percentile over 65k pixels
    x channels x batch took ~5.7s/batch).  Instead: two rounds of CDF
    counting at uniform value edges — each round is a broadcast compare
    reduced over pixels, which XLA fuses into the reduction with no
    materialized (P x bins) intermediate.  Round 1 locates each target rank
    within a coarse bin; round 2 subdivides only those bins.  Effective
    resolution range/(bins*sub_bins) (=1/1024 by default) plus count-based
    linear interpolation between sub-edges.  Returns (C, L).

    Per-pixel cost is C*(bins+1) + C*L*(sub_bins+1) compares; for the L=11
    Nyul landmarks the minimum at fixed bins*sub_bins=1024 resolution is
    bins=128, sub_bins=8 (d/ds [1024/s + L*s] = 0 -> s ~ sqrt(1024/L)).
    """
    P, C = flat.shape
    L = q.shape[0]
    f32 = jnp.float32
    x = flat.astype(f32)
    mn = x.min(axis=0)
    mx = x.max(axis=0)
    span = jnp.maximum(mx - mn, 1e-12)
    target = (q / 100.0 * (P - 1)).astype(f32)  # fractional rank
    sub_bins = max(1024 // bins, 4)

    # round 1: coarse CDF at bins+1 edges (compare fuses into the reduce —
    # no (P x E) intermediate is materialized)
    s = jnp.arange(bins + 1, dtype=f32) / bins
    edges1 = mn[:, None] + span[:, None] * s[None, :]  # (C, E)
    cdf1 = (x[:, :, None] <= edges1[None]).astype(f32).sum(axis=0)  # (C, E)
    # rank r is inside the first bin whose upper-edge count exceeds r+1
    idx1 = (cdf1[:, None, :] < (target[None, :, None] + 1.0)).astype(f32).sum(
        axis=-1
    )  # (C, L): index of first edge with cdf >= target+1
    idx1 = jnp.clip(idx1, 1.0, bins)
    lo = mn[:, None] + span[:, None] * (idx1 - 1.0) / bins  # (C, L)
    width = span[:, None] / bins

    # round 2: fine CDF within each target's coarse bin
    s2 = jnp.arange(sub_bins + 1, dtype=f32) / sub_bins
    edges2 = lo[:, :, None] + width[:, :, None] * s2[None, None, :]  # (C,L,E2)
    cdf2 = (x[:, :, None, None] <= edges2[None]).astype(f32).sum(axis=0)
    idx2 = (cdf2 < (target[None, :, None] + 1.0)).astype(f32).sum(axis=-1)
    idx2 = jnp.clip(idx2, 1.0, sub_bins)
    sub_w = width / sub_bins
    v_lo = lo + (idx2 - 1.0) * sub_w

    # linear interpolation between the bracketing sub-edges
    e_idx = idx2.astype(jnp.int32)
    c_hi = jnp.take_along_axis(cdf2, e_idx[..., None], axis=-1)[..., 0]
    c_lo = jnp.take_along_axis(cdf2, (e_idx - 1)[..., None], axis=-1)[..., 0]
    frac = jnp.clip(
        (target[None, :] + 1.0 - c_lo) / jnp.maximum(c_hi - c_lo, 1.0), 0.0, 1.0
    )
    return v_lo + frac * sub_w


def nyul_transform_fast(
    img: jnp.ndarray,
    channel_landmarks: jnp.ndarray,  # (C, L) — kept for knot parity checks
    landmark_percents: jnp.ndarray,  # (L,)
    standard_scale: jnp.ndarray,  # (L,)
    bins: int = 128,
    percentile_stride: int = 1,
) -> jnp.ndarray:
    """TPU-fast Nyul transform.

    Two wins over the reference algorithm (preprocess_helpers.py:103-114):
    * the double interp ``x -> avg landmarks -> standard scale`` composes
      into ONE piecewise-linear map ``orig_perc -> standard_scale`` —
      mathematically identical for monotone landmark sets;
    * per-image landmark percentiles come from the histogram estimator
      above instead of an O(N log^2 N) TPU sort.

    ``percentile_stride > 1`` estimates the per-image landmarks from every
    k-th pixel (the transform itself still maps every pixel) — a serving-
    only fast path that trades exact rank statistics for k-fold less CDF
    counting; NOT reference_compat.
    """
    if img.ndim == 4:
        return jax.vmap(
            lambda im: nyul_transform_fast(
                im, channel_landmarks, landmark_percents, standard_scale,
                bins, percentile_stride,
            )
        )(img)
    H, W, C = img.shape
    flat = img.reshape(-1, C)
    orig = _histogram_percentiles(
        flat[::percentile_stride], landmark_percents, bins
    )  # (C, L)
    out = jax.vmap(
        lambda xc, knots: _piecewise_map(xc, knots, standard_scale),
        in_axes=(1, 0), out_axes=1,
    )(flat, orig)
    return out.reshape(H, W, C)


def nyul_transform(
    img: jnp.ndarray,
    channel_landmarks: jnp.ndarray,  # (C, L)
    landmark_percents: jnp.ndarray,  # (L,)
    standard_scale: jnp.ndarray,  # (L,)
) -> jnp.ndarray:
    """Jittable Nyúl transform for (..., H, W, C) images."""
    C = img.shape[-1]
    if img.ndim == 3:  # (H, W, C) single image
        pix = img.reshape(-1, C)
        orig = jnp.percentile(pix, landmark_percents, axis=0).T  # (C, L)
        out = jax.vmap(_nyul_channel, in_axes=(1, 0, 0, None), out_axes=1)(
            pix, orig, channel_landmarks, standard_scale
        )
        return out.reshape(img.shape)
    if img.ndim == 4:  # (N, H, W, C)
        return jax.vmap(
            lambda im: nyul_transform(
                im, channel_landmarks, landmark_percents, standard_scale
            )
        )(img)
    raise ValueError(f"expected (H,W,C) or (N,H,W,C), got {img.shape}")


# ---------------------------------------------------------------------------
# Modality prep orchestration (prepare_single_model.py:311-343)
# ---------------------------------------------------------------------------


def prep_dwi_adc_maps(
    train_imgs: np.ndarray,
    test_imgs: np.ndarray,
    bvals: Sequence[float],
    reference_compat: bool = True,
):
    """Compute the per-split ADC maps.

    ``reference_compat=True`` reproduces prepare_single_model.py:319-332
    exactly: one *shared* ADC map per split, computed from sample 0 (train),
    sample 1 (val) and test sample 0 — a reference quirk (``imgs[i]`` indexes
    samples, not splits).  ``False`` computes a per-sample ADC channel (the
    physically intended behavior).
    """
    if reference_compat:
        maps = [
            compute_adc_map(jnp.asarray(train_imgs[0]), bvals),
            compute_adc_map(jnp.asarray(train_imgs[1]), bvals),
            compute_adc_map(jnp.asarray(test_imgs[0]), bvals),
        ]
        maps = [preprocess_adc(m) for m in maps]
        adc_min = float(jnp.min(maps[0]))
        adc_max = float(jnp.max(maps[0]))
        return [zero_to_one_adc(m, adc_min, adc_max) for m in maps]
    # corrected: per-sample maps for each split
    tr = preprocess_adc(compute_adc_map(jnp.asarray(train_imgs), bvals))
    te = preprocess_adc(compute_adc_map(jnp.asarray(test_imgs), bvals))
    adc_min = float(jnp.min(tr))
    adc_max = float(jnp.max(tr))
    return [
        zero_to_one_adc(tr, adc_min, adc_max),
        None,  # val maps are sliced from train by the caller
        zero_to_one_adc(te, adc_min, adc_max),
    ]


def append_adc(img: jnp.ndarray, adc_map: jnp.ndarray) -> jnp.ndarray:
    """Resize the ADC map to the image's spatial size and concat as the last
    channel (dataset.py:79-88)."""
    from ..ops.resize import resize_bilinear

    adc = resize_bilinear(adc_map, img.shape[-3:-1])
    if img.ndim == 4 and adc.ndim == 3:
        adc = jnp.broadcast_to(adc[None], (img.shape[0],) + adc.shape)
    return jnp.concatenate([img, adc], axis=-1)

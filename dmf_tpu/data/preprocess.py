"""Preprocessing kernels — pure, jittable, channels-last (NHWC).

TPU-native re-implementations of the reference preprocessing
(dataset.py:9-53, preprocess_helpers.py:27-167, prepare_single_model.py:311-343).
All hot paths are expressible as one fused XLA program over batched volumes;
``dmf_tpu.ops.preprocess_pallas`` provides a hand-fused Pallas variant of the
DWI normalizer for the inference fast path.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
        # percentiles per (sample, channel): vectorized over the train set
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
    def transform(self, img: jnp.ndarray) -> jnp.ndarray:
        """Standardize one image or a batch, (..., H, W, C) -> same shape.

        Per channel: map image-specific landmark percentiles to the fitted
        averages, then map those to the standard [0,1] scale (double interp,
        preprocess_helpers.py:103-114).
        """
        if not self.fitted:
            raise RuntimeError("Call fit() first")
        return nyul_transform(
            img,
            jnp.asarray(self.channel_landmarks, dtype=jnp.float32),
            jnp.asarray(self.landmarks, dtype=jnp.float32),
            jnp.asarray(self.standard_scale, dtype=jnp.float32),
        )

    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        return self.transform(img)


def _nyul_channel(x, orig_perc, avg_perc, standard_scale):
    mid = jnp.interp(x, orig_perc, avg_perc)
    return jnp.interp(mid, avg_perc, standard_scale)


def nyul_transform(
    img: jnp.ndarray,
    channel_landmarks: jnp.ndarray,  # (C, L)
    landmark_percents: jnp.ndarray,  # (L,)
    standard_scale: jnp.ndarray,  # (L,)
) -> jnp.ndarray:
    """Jittable Nyúl transform for (..., H, W, C) images."""
    lead = img.shape[:-1]
    C = img.shape[-1]
    flat = img.reshape(-1, C) if len(lead) > 1 else img[None]
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

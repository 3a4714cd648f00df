"""Auxiliary losses: reconstruction, mimic, regularizers (NHWC layout).

Reference counterparts: train.py:991-1048 (regularizers, charbonnier/recon,
mimic), loss.py:7-9 (proj cosine), train_fusion.py:709-744 (multi-scale recon
list loss).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Reference: train.py:1041-1042."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps**2))


def recon_image_loss(pred_logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid + clamp + charbonnier. Reference: train.py:1043-1048."""
    pred = jnp.clip(jax.nn.sigmoid(pred_logits), 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)
    return charbonnier_loss(pred, target)


def single_model_recon_loss(
    recon_feats: Sequence[Optional[jnp.ndarray]],
    inputs: jnp.ndarray,
) -> jnp.ndarray:
    """Sum of per-head recon losses against the (channel-meaned) input.

    Reference: train.py:445-454 (``compute_aux_losses``): each recon head
    output is bilinearly upsampled to the input size; if the recon has one
    channel and the input more, the target is the channel mean.  NOT
    normalized by count (unlike the fusion variant).
    """
    total = jnp.zeros((), dtype=inputs.dtype)
    for pred_r in recon_feats:
        if pred_r is None:
            continue
        up = resize_bilinear(pred_r, inputs.shape[-3:-1])
        target = inputs
        if up.shape[-1] == 1 and target.shape[-1] > 1:
            target = target.mean(axis=-1, keepdims=True)
        total = total + recon_image_loss(up, target)
    return total


def compute_recon_list_loss(
    recon_list,
    input_img: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale recon loss normalized by number of valid reconstructions.

    Reference: train_fusion.py:709-744.  On channel mismatch both sides are
    channel-meaned (train_fusion.py:735-739).
    """
    if recon_list is None:
        return jnp.zeros((), dtype=input_img.dtype)
    if not isinstance(recon_list, (list, tuple)):
        recon_list = [recon_list]
    valid = [r for r in recon_list if r is not None]
    if not valid:
        return jnp.zeros((), dtype=input_img.dtype)
    total = jnp.zeros((), dtype=input_img.dtype)
    for r in valid:
        r_up = resize_bilinear(r, input_img.shape[-3:-1])
        if r_up.shape[-1] != input_img.shape[-1]:
            r_up = r_up.mean(axis=-1, keepdims=True)
            target = input_img.mean(axis=-1, keepdims=True)
        else:
            target = input_img
        total = total + recon_image_loss(r_up, target)
    return total / len(valid)


def proj_cosine_loss(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """1 - cosine similarity along the channel axis. Reference: loss.py:7-9.

    Torch's cosine_similarity(dim=1) on NCHW maps to the channel (last) axis
    in NHWC.
    """
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    cos = (an * bn).sum(axis=-1)
    return (1.0 - cos).mean()


def mimic_feat_loss(s_feat: jnp.ndarray, t_feat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Cosine distance between flattened, L2-normalized features; teacher
    (second argument) is detached. Reference: train.py:1033-1038."""
    t_feat = jax.lax.stop_gradient(t_feat)
    s = s_feat.reshape(s_feat.shape[0], -1)
    t = t_feat.reshape(t_feat.shape[0], -1)
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=1, keepdims=True), 1e-12)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    cos = (s * t).sum(axis=1)
    return (1.0 - jnp.clip(cos, -1.0 + eps, 1.0 - eps)).mean()


def compute_attn_energy_loss(aux: dict) -> jnp.ndarray:
    """L1 energy of the mask-attention map. Reference: train.py:991-1000.

    (The reference call site passes a third argument that would TypeError if
    ``attn_reg_enabled`` were True — train.py:358 vs :991; implemented with
    the correct 1-arg signature here.)
    """
    attn_map = aux.get("mask_attn_map")
    if attn_map is None:
        return jnp.zeros(())
    return jnp.abs(attn_map).mean()


def compute_feature_consistency_loss(aux: dict) -> jnp.ndarray:
    """MSE between channel-normalized p1 and (upsampled) p2 projections.

    Reference: train.py:1001-1018.
    """
    proj_pairs = aux.get("proj_pairs")
    if proj_pairs is None:
        return jnp.zeros(())
    p1, _p1_r, p2, _p2_r = proj_pairs[:4]
    p2_up = resize_bilinear(p2, p1.shape[-3:-1])
    p1n = p1 / (jnp.linalg.norm(p1, axis=-1, keepdims=True) + 1e-6)
    p2n = p2_up / (jnp.linalg.norm(p2_up, axis=-1, keepdims=True) + 1e-6)
    return jnp.mean((p1n - p2n) ** 2)


def compute_feat_norm_loss(aux: dict) -> jnp.ndarray:
    """Mean-squared-activation penalty over raw features.

    Reference: train.py:1021-1030 (enabled by default with lambda 4e-5,
    parameters_generate.py:169-170).
    """
    raw_feats: Optional[List[jnp.ndarray]] = aux.get("raw_feats")
    if raw_feats is None:
        return jnp.zeros(())
    total = jnp.zeros(())
    for f in raw_feats:
        total = total + jnp.mean(f.astype(jnp.float32) ** 2)
    return total

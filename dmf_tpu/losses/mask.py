"""Segmentation-mask losses (pure jittable functions, NHWC layout).

Reference counterparts: ``SoftDiceLoss`` (loss.py:45-62), ``DiceBCELoss``
(loss.py:11-43), ``safe_mask_loss`` (train_fusion.py:747-760).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.resize import resize_nearest


def soft_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Soft dice over sigmoid probabilities, reduced per sample then meaned.

    Reference: loss.py:45-62 (the default ``mask_loss_type='dice'``,
    parameters_generate.py:126).
    """
    probs = jax.nn.sigmoid(logits)
    axes = tuple(range(1, probs.ndim))  # all but batch (masks are 1-channel)
    intersection = (probs * targets).sum(axis=axes)
    union = probs.sum(axis=axes) + targets.sum(axis=axes)
    dice = (2.0 * intersection + eps) / (union + eps)
    return 1.0 - dice.mean()


def dice_bce_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    bce_weight: float = 1.0,
    dice_weight: float = 1.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Foreground dice + BCE-with-logits. Reference: loss.py:11-43.

    Note the reference's dice term here omits ``eps`` in the numerator
    (loss.py:36-38) unlike ``SoftDiceLoss`` — reproduced exactly.
    """
    bce = jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    probs = jax.nn.sigmoid(logits)
    axes = tuple(range(1, probs.ndim))
    intersection = (probs * targets).sum(axis=axes)
    denom = probs.sum(axis=axes) + targets.sum(axis=axes) + eps
    dice_score = (2.0 * intersection) / denom
    dice_loss = 1.0 - dice_score.mean()
    return bce_weight * bce + dice_weight * dice_loss


def safe_mask_loss(
    pred_logits: jnp.ndarray,
    gt_mask: jnp.ndarray,
    mask_loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    reference_compat: bool = True,
) -> jnp.ndarray:
    """Mask loss with shape guard (NHWC).

    Reference: train_fusion.py:747-760 — it computes a nearest-resized GT
    but then passes the **unresized** GT to the criterion (latent bug).
    Shapes only ever mismatch outside the default config, where the
    reference's dice would crash on the broadcast; we always feed the
    resized GT on mismatch (the fixed behavior, and identical to the
    reference whenever the reference runs at all).  ``reference_compat``
    is accepted for call-site uniformity but does not change the result.
    """
    del reference_compat  # see docstring: no observable compat divergence
    if pred_logits.shape[-3:-1] != gt_mask.shape[-3:-1]:
        gt_mask = resize_nearest(gt_mask, pred_logits.shape[-3:-1])
    return mask_loss_fn(pred_logits, gt_mask)

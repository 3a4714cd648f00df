"""Classification losses (pure jittable functions).

Behavior-compatible re-implementations of the reference's loss classes
(loss.py:66-213) and the class-weight computation
(selector_helpers.py:25-41), written as pure functions for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def label_smoothing(labels: jnp.ndarray, num_classes: int, alpha: float) -> jnp.ndarray:
    """Build the smoothed target distribution.

    Reference: ``LabelSmoothing`` (loss.py:190-213): every class gets
    ``alpha / (C - 1)`` and the true class gets ``1 - alpha``.
    """
    confidence = 1.0 - alpha
    fill = alpha / (num_classes - 1)
    onehot = jax.nn.one_hot(labels, num_classes)
    return onehot * confidence + (1.0 - onehot) * fill


def soft_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Soft-label focal loss. Reference: ``SoftFocalLoss`` (loss.py:133-155).

    ``targets`` may be integer class indices or a (B, C) distribution.
    """
    if targets.ndim == 1:
        targets = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    focal_weight = (1.0 - probs) ** gamma
    loss = -(targets * focal_weight * log_probs).sum(axis=-1)
    return loss.mean()


def soft_weighted_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Soft-label weighted focal loss — the reference default (``wfl``).

    Reference: ``SoftWeightedFocalLoss`` (loss.py:157-187): the per-class
    weight multiplies the focal weight elementwise across the class axis.
    """
    if targets.ndim == 1:
        targets = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    focal_weight = (1.0 - probs) ** gamma
    if class_weights is not None:
        focal_weight = focal_weight * class_weights.reshape(1, -1)
    loss = -(targets * focal_weight * log_probs).sum(axis=-1)
    return loss.mean()


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 1.0,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Hard-label focal loss. Reference: ``FocalLoss`` (loss.py:66-84)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    return (alpha * (1.0 - pt) ** gamma * ce).mean()


def weighted_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Per-class-alpha focal loss. Reference: ``WeightedFocalLoss``
    (loss.py:87-130)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    idx = labels.astype(jnp.int32)
    ce = -jnp.take_along_axis(log_probs, idx[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    if class_weights is not None:
        alpha = class_weights[idx]
    else:
        alpha = 1.0
    return (alpha * (1.0 - pt) ** gamma * ce).mean()


def compute_class_weights(train_labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Inverse-class-frequency weights.

    Reference: selector_helpers.py:31-36:
    ``weights = total / (num_classes * (counts + 1e-6))``.
    """
    labels = jnp.asarray(train_labels).astype(jnp.int32)
    counts = jnp.bincount(labels, length=num_classes).astype(jnp.float32)
    total = labels.shape[0]
    return total / (num_classes * (counts + 1e-6))

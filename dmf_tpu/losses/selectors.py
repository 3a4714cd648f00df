"""Loss selectors — functional replacements for selector_helpers.py:14-114."""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from .classification import (
    compute_class_weights,
    soft_focal_loss,
    soft_weighted_focal_loss,
)
from .mask import dice_bce_loss, soft_dice_loss


def get_classification_loss_fn(
    cfg: Config, train_labels, method: str
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Build the classification loss. Reference: selector_helpers.py:14-46.

    For ``wfl`` the per-class weights are the inverse class frequencies of
    the training labels.
    """
    clp = cfg.model_config(method).classification_loss
    code = clp.loss_code
    if code == "fl":
        gamma = clp.gamma if clp.gamma is not None else 2.0
        return functools.partial(soft_focal_loss, gamma=gamma)
    if code == "wfl":
        gamma = clp.gamma if clp.gamma is not None else 2.0
        weights = np.asarray(
            compute_class_weights(jnp.asarray(train_labels), cfg.class_num)
        )
        return functools.partial(
            soft_weighted_focal_loss,
            gamma=gamma,
            class_weights=jnp.asarray(weights),
        )
    raise ValueError(
        f"Invalid classification_loss_code {code!r}. Valid options: ['fl', 'wfl']"
    )


def get_recon_loss_fn(
    cfg: Config, method: str
) -> Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]]:
    """Build the reconstruction loss. Reference: selector_helpers.py:51-64
    (``mse`` is the only supported code; None when recon is disabled).

    Note the training steps use the Charbonnier image-recon loss from
    losses/aux.py (train.py:1041-1048 semantics); this selector mirrors the
    reference's separate MSE selector surface.
    """
    mc = cfg.model_config(method)
    if not mc.recon_enabled:
        return None
    if mc.reconstruction_loss_code == "mse":
        return lambda pred, target: jnp.mean((pred - target) ** 2)
    raise ValueError(
        f"Invalid {method} reconstruction_loss_code "
        f"{mc.reconstruction_loss_code!r}. Only 'mse' supported."
    )


def get_mask_loss_fn(
    cfg: Config, method: str
) -> Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]]:
    """Build the mask loss. Reference: selector_helpers.py:95-114."""
    mp = cfg.model_config(method).mask
    if not mp.enabled:
        return None
    if mp.mask_loss_type == "dice":
        return soft_dice_loss
    if mp.mask_loss_type == "dice_bce":
        # reference passes fixed 1.0/1.0 weights (selector_helpers.py:106)
        return functools.partial(dice_bce_loss, bce_weight=1.0, dice_weight=1.0)
    raise ValueError(f"Invalid mask loss: {mp.mask_loss_type}")

"""Jitted train/eval steps for the single-modality encoder.

Behavior-compatible redesign of ``LightningSingleModel._shared_step``
(train.py:294-428) as pure functions: one compiled train step consuming the
dynamic per-group hyperparameters (freeze/unfreeze, plateau LR) and the
aux-loss weight as data, so nothing retraces across the whole schedule.

Faithfully reproduced semantics (cfg.reference_compat=True):
* label smoothing only in training (train.py:338-340);
* val loss is the classification loss alone — every auxiliary term is added
  with ``... if is_train else 0.0`` in the reference (train.py:360-400);
* recon/mimic double weighting: ``compute_aux_losses`` pre-multiplies by
  ``lambda * aux_w`` (train.py:462-464) and the caller multiplies again
  (train.py:397-400), so the effective train weight is
  ``lambda^2 * aux_w^2`` while the logged metric carries one factor;
* the single-model recon loss is a *sum* over heads (train.py:445-454),
  unlike the fusion variant which normalizes.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..losses import (
    compute_attn_energy_loss,
    compute_feat_norm_loss,
    compute_feature_consistency_loss,
    label_smoothing,
    make_weighted_reduce,
    mimic_feat_loss,
    single_model_recon_loss,
)
from ..models.layers import bn_sample_weight
from .optim import (
    GroupSpec,
    GroupedHyperParams,
    adamw_update,
    count_nonfinite,
    global_norm,
    group_grad_norms,
)
from .state import TrainState


def compute_single_losses(
    cfg: Config,
    method: str,
    clf_loss_fn,
    mask_loss_fn,
    logits,
    aux,
    mask_pred,
    inputs,
    masks,
    labels,
    aux_w,
    is_train: bool,
    valid=None,
):
    """Total loss + per-term metrics for one batch (train.py:294-428).

    ``valid``: optional (B,) 0/1 mask; when given, every reduction becomes a
    validity-weighted per-sample mean so padded duplicate rows (the mesh
    tail, loop.py) drop out exactly — ``None`` keeps the bit-identical
    unweighted path."""
    mc = cfg.model_config(method)
    metrics: Dict[str, jnp.ndarray] = {}
    reduce_ = make_weighted_reduce(valid)

    if is_train and mc.label_smoothing_enabled:
        targets = label_smoothing(labels, cfg.class_num, mc.label_smoothing_alpha)
    else:
        targets = labels
    clf_loss = reduce_(clf_loss_fn, logits, targets)
    loss = clf_loss
    metrics["clf_loss"] = clf_loss

    if mc.attn_reg_enabled:
        attn_e = reduce_(lambda a: compute_attn_energy_loss(a), aux)
        feat_c = reduce_(lambda a: compute_feature_consistency_loss(a), aux)
        if is_train:
            loss = loss + attn_e * mc.lambda_attn_energy + feat_c * mc.lambda_feature_consistency
        metrics["attn_energy_loss"] = attn_e
    if mc.feat_norm_reg_enabled:
        feat_n = reduce_(lambda a: compute_feat_norm_loss(a), aux)
        if is_train:
            loss = loss + feat_n * mc.lambda_feat_norm
        metrics["feat_norm_loss"] = feat_n

    if mc.mask.enabled and mask_pred is not None and masks is not None:
        mask_loss = reduce_(mask_loss_fn, mask_pred, masks)
        if is_train:
            loss = loss + mc.mask.lambda_mask * mask_loss
        metrics["mask_loss"] = mask_loss
    else:
        metrics["mask_loss"] = jnp.zeros(())

    recon_metric = jnp.zeros(())
    mimic_metric = jnp.zeros(())
    if mc.recon_enabled:
        recon_raw = reduce_(single_model_recon_loss, aux["recon_feats"], inputs)
        mimic_raw = jnp.zeros(())
        if mc.mimic_enabled and aux.get("proj_pairs") is not None:
            p1, p1_r, p2, p2_r = aux["proj_pairs"][:4]
            mimic_raw = (reduce_(mimic_feat_loss, p1, p1_r)
                         + reduce_(mimic_feat_loss, p2, p2_r))
        if is_train:
            if cfg.reference_compat:
                # double lambda*aux_w application (train.py:397-400 + 462-464)
                recon_metric = mc.lambda_recon * recon_raw * aux_w
                mimic_metric = mc.lambda_mimic * mimic_raw * aux_w
                loss = loss + (
                    mc.lambda_recon * recon_metric * aux_w
                    + mc.lambda_mimic * mimic_metric * aux_w
                )
            else:
                recon_metric = recon_raw
                mimic_metric = mimic_raw
                loss = loss + aux_w * (
                    mc.lambda_recon * recon_raw + mc.lambda_mimic * mimic_raw
                )
        else:
            recon_metric = recon_raw
            mimic_metric = mimic_raw
    metrics["recon_loss"] = recon_metric
    metrics["mimic_loss"] = mimic_metric

    preds = jnp.argmax(logits, axis=-1)
    correct = (preds == labels).astype(jnp.float32)
    if valid is None:
        metrics["acc"] = correct.mean()
    else:
        v = valid.astype(jnp.float32)
        metrics["acc"] = (correct * v).sum() / jnp.maximum(v.sum(), 1.0)
    metrics["loss"] = loss
    return loss, metrics


def make_single_train_step(
    cfg: Config,
    method: str,
    model,
    clf_loss_fn: Callable,
    mask_loss_fn: Optional[Callable],
    spec: GroupSpec,
    donate: bool = True,
    jit_compile: bool = True,
):
    """Build the jitted train step.

    Step signature: ``(state, batch, rng, hp) -> (state, metrics)`` where
    ``batch`` has keys imgs / labels / aux_w (+ masks) — ``aux_w`` is the
    scheduled aux-loss weight as a scalar array — and ``hp`` is a
    GroupedHyperParams vector set.
    """
    mc = cfg.model_config(method)
    use_clip = (not cfg.reference_compat) and mc.grad_clip and mc.grad_clip > 0

    def loss_fn(params, batch_stats, batch, rng):
        valid = batch.get("valid")  # (B,) 0/1 under a mesh (padded tail)
        with bn_sample_weight(valid):
            (logits, aux, mask_pred), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["imgs"],
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
        loss, metrics = compute_single_losses(
            cfg, method, clf_loss_fn, mask_loss_fn,
            logits, aux, mask_pred,
            batch["imgs"], batch.get("masks"), batch["labels"],
            batch["aux_w"], is_train=True, valid=valid,
        )
        return loss, (mutated["batch_stats"], metrics)

    def train_step(state: TrainState, batch, rng, hp: GroupedHyperParams):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        metrics["grad_norm"] = global_norm(grads)
        # backbone-only (per-group) norms + NaN-grad counter, the
        # reference's observability at train.py:825-862 and 229-233
        metrics.update(group_grad_norms(grads, spec))
        metrics["grad_nonfinite"] = count_nonfinite(grads)
        if use_clip:
            from .optim import clip_by_global_norm

            grads, _ = clip_by_global_norm(grads, mc.grad_clip)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, state.params, spec, hp,
            b1=mc.optimizer.betas[0], b2=mc.optimizer.betas[1],
            eps=mc.optimizer.eps,
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    if not jit_compile:
        return train_step
    donate_args = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args)


def make_single_eval_step(cfg: Config, method: str, model,
                          clf_loss_fn, mask_loss_fn):
    """Jitted eval step returning (logits, probs, metrics)."""

    def eval_step(state: TrainState, batch):
        logits, aux, mask_pred = model.apply(
            state.variables, batch["imgs"], train=False
        )
        _, metrics = compute_single_losses(
            cfg, method, clf_loss_fn, mask_loss_fn,
            logits, aux, mask_pred,
            batch["imgs"], batch.get("masks"), batch["labels"],
            jnp.ones(()), is_train=False,
            # padded-tail rows (pad_to_batch/mesh batches) must not bias
            # the val metrics that drive plateau/early-stop decisions:
            # every reduction is validity-weighted, exactly like training
            valid=batch.get("valid"),
        )
        # reference val_loss is the classification loss alone
        metrics["loss"] = metrics["clf_loss"]
        probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs, metrics

    return jax.jit(eval_step)

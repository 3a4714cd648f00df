"""Jitted train/eval steps for fusion training (both encoders + fusion head).

Behavior-compatible redesign of ``LightningFusionModel._shared_step``
(train_fusion.py:204-321) as one compiled program: two encoder forwards,
fusion forward, composite loss.  The gradual-unfreeze schedule arrives as
dynamic per-group hyperparameters (see FusionOptController), so the step
never recompiles across the whole unfreeze plan.

Reproduced reference quirks (cfg.reference_compat=True):
* all three mask losses are computed against the same GT mask and averaged
  (train_fusion.py:246-254), via ``safe_mask_loss`` which quietly ignores
  its own resize (train_fusion.py:747-760);
* the regularizer block reads keys the fusion aux dict doesn't have
  (``raw_feats``/``mask_attn_map``), so every regularizer contributes 0
  (train_fusion.py:260-267) — our loss fns .get() the same keys;
* the "fused mimic" reads ``aux['proj_fused']`` — a (B,C,H,W) tensor — and
  pairs its first four *samples* as (student, teacher) couples
  (train_fusion.py:291-296); with ``reference_compat=False`` the term is
  dropped instead.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..losses import (
    compute_recon_list_loss,
    label_smoothing,
    make_weighted_reduce,
    mimic_feat_loss,
    safe_mask_loss,
)
from ..models.layers import bn_sample_weight
from .optim import (
    GroupSpec,
    GroupedHyperParams,
    adamw_update,
    build_group_spec,
    count_nonfinite,
    global_norm,
)
from .state import TrainState


def build_fusion_group_spec(params, cfg: Config) -> GroupSpec:
    """Group ids over the combined {dwi, dce, fusion} param tree.

    Encoder depth groups 0..2 (dce+dwi merged per depth,
    selector_helpers.py:479-490), fusion head = group 3 (always trainable).
    """
    dwi_spec = build_group_spec(
        params["dwi"], cfg.dwi_model.use_backbone, cfg.reference_compat
    )
    dce_spec = build_group_spec(
        params["dce"], cfg.dce_model.use_backbone, cfg.reference_compat
    )
    fusion_ids = jax.tree.map(lambda _: 3, params["fusion"])
    return GroupSpec(
        group_ids={
            "dwi": dwi_spec.group_ids,
            "dce": dce_spec.group_ids,
            "fusion": fusion_ids,
        },
        num_groups=4,
        names=("enc_backbone", "enc_block1+2", "enc_block3+other", "fusion_head"),
    )


def fusion_sample_pair_mimic(proj_fused: jnp.ndarray) -> jnp.ndarray:
    """The reference's fused 'mimic': cosine distance between the fused
    projections of sample pairs (0,1) and (2,3), channels as rows
    (train_fusion.py:291-296 with mimic_feat_loss's flatten(1) on NCHW)."""
    if proj_fused.shape[0] < 4:
        return jnp.zeros(())
    # NHWC sample (H, W, C) -> (C, H*W) rows like the reference's NCHW flatten
    p = proj_fused.transpose(0, 3, 1, 2).reshape(proj_fused.shape[0],
                                                 proj_fused.shape[-1], -1)
    return (mimic_feat_loss(p[0], p[1]) + mimic_feat_loss(p[2], p[3])) / 2.0


def make_fusion_apply(dwi_model, dce_model, fusion_model):
    """Full fusion forward from raw inputs (train_fusion.py:227-236)."""

    def apply_fn(variables, dwi_x, dce_x, train, mc=False, rngs=None,
                 mutable=False):
        kw = dict(rngs=rngs)
        muts = ["batch_stats"] if mutable else []

        def run(model, vars_, *args):
            if mutable:
                out, mut = model.apply(vars_, *args, train=train, mc=mc,
                                       mutable=muts, **kw)
                return out, mut["batch_stats"]
            return model.apply(vars_, *args, train=train, mc=mc, **kw), None

        (d_logits, d_aux, d_mask), d_bs = run(dwi_model, variables["dwi"], dwi_x)
        (c_logits, c_aux, c_mask), c_bs = run(dce_model, variables["dce"], dce_x)
        (logits, fused_mask, aux), f_bs = run(
            fusion_model, variables["fusion"],
            d_aux["raw_feats"], c_aux["raw_feats"], d_mask, c_mask,
        )
        new_bs = {"dwi": d_bs, "dce": c_bs, "fusion": f_bs} if mutable else None
        parts = {
            "dwi_aux": d_aux, "dce_aux": c_aux,
            "dwi_mask": d_mask, "dce_mask": c_mask,
        }
        return logits, fused_mask, aux, parts, new_bs

    return apply_fn


def compute_fusion_losses(
    cfg: Config,
    clf_loss_fn,
    mask_loss_fn,
    logits,
    fused_mask,
    aux,
    parts,
    dwi_x,
    dce_x,
    masks,
    labels,
    aux_w,
    is_train: bool,
    valid=None,
):
    """``valid``: optional (B,) 0/1 mask for exact padded-tail semantics
    under a mesh (see losses/weighting.py); None = unweighted path."""
    fp = cfg.fusion_model
    metrics: Dict[str, jnp.ndarray] = {}
    reduce_ = make_weighted_reduce(valid)

    if is_train and fp.label_smoothing_enabled:
        targets = label_smoothing(labels, cfg.class_num, fp.label_smoothing_alpha)
    else:
        targets = labels
    cls_loss = reduce_(clf_loss_fn, logits, targets)
    loss = cls_loss
    metrics["clf_loss"] = cls_loss

    if fp.mask.enabled and masks is not None:
        def _mask3(dm, cm, fm, gt):
            return (
                safe_mask_loss(dm, gt, mask_loss_fn, cfg.reference_compat)
                + safe_mask_loss(cm, gt, mask_loss_fn, cfg.reference_compat)
                + safe_mask_loss(fm, gt, mask_loss_fn, cfg.reference_compat)
            ) / 3.0

        mask_loss = reduce_(_mask3, parts["dwi_mask"], parts["dce_mask"],
                            fused_mask, masks)
        if is_train:
            loss = loss + fp.mask.lambda_mask * mask_loss
        metrics["mask_loss"] = mask_loss
    else:
        metrics["mask_loss"] = jnp.zeros(())

    # regularizers: zero by construction on fusion aux (see module docstring)

    recon_val = jnp.zeros(())
    mimic_val = jnp.zeros(())
    if is_train and fp.recon_enabled:
        dwi_in = jax.lax.stop_gradient(dwi_x)
        dce_in = jax.lax.stop_gradient(dce_x)
        fused_in = jnp.concatenate([dwi_in, dce_in], axis=-1)

        def _recon3(d_rf, c_rf, f_rf, dx, cx, fx):
            return (
                compute_recon_list_loss(d_rf, dx)
                + compute_recon_list_loss(c_rf, cx)
                + compute_recon_list_loss(f_rf, fx)
            ) / 3.0

        recon_val = reduce_(
            _recon3, parts["dwi_aux"]["recon_feats"],
            parts["dce_aux"]["recon_feats"], aux["recon_fused"],
            dwi_in, dce_in, fused_in,
        )
        loss = loss + fp.lambda_recon * recon_val * aux_w

        if fp.mimic_enabled and aux.get("proj_fused") is not None:
            if cfg.reference_compat:
                # sample-PAIR term (rows 0-3) — not per-sample separable.
                # Padding appends duplicates at the tail, so rows 0-3 are
                # genuine exactly when >= 4 rows are valid; the reference's
                # short-batch value is 0 below 4 rows (train_fusion.py:291-296)
                mimic_val = fusion_sample_pair_mimic(aux["proj_fused"])
                if valid is not None:
                    mimic_val = jnp.where(
                        valid.astype(jnp.float32).sum() >= 4.0, mimic_val, 0.0
                    )
            else:
                mimic_val = jnp.zeros(())
            loss = loss + fp.lambda_mimic * mimic_val * aux_w
    metrics["recon_loss"] = recon_val
    metrics["mimic_loss"] = mimic_val

    preds = jnp.argmax(logits, axis=-1)
    correct = (preds == labels).astype(jnp.float32)
    if valid is None:
        metrics["acc"] = correct.mean()
    else:
        v = valid.astype(jnp.float32)
        metrics["acc"] = (correct * v).sum() / jnp.maximum(v.sum(), 1.0)
    metrics["loss"] = loss
    return loss, metrics


def make_fusion_train_step(
    cfg: Config,
    dwi_model,
    dce_model,
    fusion_model,
    clf_loss_fn: Callable,
    mask_loss_fn: Optional[Callable],
    spec: GroupSpec,
    donate: bool = True,
    jit_compile: bool = True,
):
    """Step: ``(state, batch, rng, hp) -> (state, metrics)``; batch keys
    dwi / dce / labels / aux_w (+ masks)."""
    apply_fn = make_fusion_apply(dwi_model, dce_model, fusion_model)
    opt = cfg.fusion_model.optimizer

    def loss_fn(params, batch_stats, batch, rng):
        variables = {
            m: {"params": params[m], "batch_stats": batch_stats[m]}
            for m in ("dwi", "dce", "fusion")
        }
        valid = batch.get("valid")  # (B,) 0/1 under a mesh (padded tail)
        with bn_sample_weight(valid):
            logits, fused_mask, aux, parts, new_bs = apply_fn(
                variables, batch["dwi"], batch["dce"], train=True,
                rngs={"dropout": rng}, mutable=True,
            )
        loss, metrics = compute_fusion_losses(
            cfg, clf_loss_fn, mask_loss_fn, logits, fused_mask, aux, parts,
            batch["dwi"], batch["dce"], batch.get("masks"), batch["labels"],
            batch["aux_w"], is_train=True, valid=valid,
        )
        return loss, (new_bs, metrics)

    def train_step(state: TrainState, batch, rng, hp: GroupedHyperParams):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        metrics["grad_norm"] = global_norm(grads)
        metrics["dwi_grad_norm"] = global_norm(grads["dwi"])
        metrics["dce_grad_norm"] = global_norm(grads["dce"])
        metrics["fusion_grad_norm"] = global_norm(grads["fusion"])
        metrics["grad_nonfinite"] = count_nonfinite(grads)
        new_params, new_opt = adamw_update(
            grads, state.opt_state, state.params, spec, hp,
            b1=opt.betas[0], b2=opt.betas[1], eps=opt.eps,
        )
        return (
            TrainState(params=new_params, batch_stats=new_bs,
                       opt_state=new_opt, step=state.step + 1),
            metrics,
        )

    if not jit_compile:
        return train_step
    donate_args = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args)


def make_fusion_eval_step(cfg: Config, dwi_model, dce_model, fusion_model,
                          clf_loss_fn, mask_loss_fn):
    apply_fn = make_fusion_apply(dwi_model, dce_model, fusion_model)

    def eval_step(state: TrainState, batch):
        variables = {
            m: {"params": state.params[m], "batch_stats": state.batch_stats[m]}
            for m in ("dwi", "dce", "fusion")
        }
        logits, fused_mask, aux, parts, _ = apply_fn(
            variables, batch["dwi"], batch["dce"], train=False
        )
        _, metrics = compute_fusion_losses(
            cfg, clf_loss_fn, mask_loss_fn, logits, fused_mask, aux, parts,
            batch["dwi"], batch["dce"], batch.get("masks"), batch["labels"],
            jnp.ones(()), is_train=False,
            # padded-tail rows must not bias the monitored val metrics
            # (see make_single_eval_step)
            valid=batch.get("valid"),
        )
        metrics["loss"] = metrics["clf_loss"]
        probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs, metrics

    return jax.jit(eval_step)

"""Fold-parallel PRODUCT training loop: K-fold CV as one vmapped program.

The reference trains its 5 stratified folds strictly sequentially (the
outer loop in run_training.py re-enters ``Trainer.fit`` per fold); at the
anchor batch of 32 a single fold underfeeds the MXU, so the fold axis —
embarrassingly parallel — is vmapped into the compiled step instead
(parallel/multifold.py documents the kernel-level design).  This module is
the production epoch loop around that step: the fit_single control plane
(plateau LR, early stopping, unfreeze timers, aux-loss schedule,
best-checkpointing) replicated PER FOLD on the host, driving one lockstep
device program.

Exactness with K sequential ``fit_single`` runs (pinned by
tests/test_multifold_loop.py) is preserved by construction:

* per-fold rng streams: each fold consumes splits from its own
  ``PRNGKey(seed)``/``RandomState(seed)`` exactly as its sequential run
  would — a fold that has exhausted its (possibly shorter) epoch draws
  nothing;
* ragged fold sizes and early-stopped folds ride the ``active`` select of
  ``make_multifold_step(with_active=True)``: the dead fold's discarded
  step costs compute but leaves its state bit-identical;
* padded tail batches carry the ``valid`` mask, whose weighted-loss and
  weighted-BN semantics are already pinned ≡ short-batch execution
  (tests/test_spmd_loop.py::TestTailBatchSemantics);
* per-fold ``wfl`` class weights (different per fold split) enter the
  vmapped step as a stacked ``(K, C)`` argument instead of baked
  constants, so one trace serves every fold.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.pipeline import ArrayDataset, iterate_batches
from ..evals.metrics import MeanMetric, classification_report
from ..losses import get_mask_loss_fn
from ..losses.classification import (
    compute_class_weights,
    soft_focal_loss,
    soft_weighted_focal_loss,
)
from ..parallel.multifold import index_fold_state, stack_fold_states
from ..utils.checkpoint import BestCheckpointer
from ..utils.logging import MetricLogger
from .loop import FitResult
from .optim import build_group_spec
from .schedule import EarlyStopping, ReduceLROnPlateau, aux_loss_weight, make_scheduler
from .single import compute_single_losses, make_single_train_step
from .state import TrainState


def _clf_factory(cfg: Config, method: str):
    """Classification loss with fold-varying class weights lifted into a
    traced ``(C,)`` argument (losses/selectors.py:20-45 semantics)."""
    clp = cfg.model_config(method).classification_loss
    gamma = clp.gamma if clp.gamma is not None else 2.0
    weighted = clp.loss_code == "wfl"

    def make(clf_w):
        if weighted:
            return functools.partial(soft_weighted_focal_loss, gamma=gamma,
                                     class_weights=clf_w)
        return functools.partial(soft_focal_loss, gamma=gamma)

    return make, weighted


def fit_single_multifold(
    cfg: Config,
    method: str,
    model,
    states: Sequence[TrainState],
    fold_train: Sequence[Dict[str, np.ndarray]],
    fold_val: Sequence[Dict[str, np.ndarray]],
    processors: Sequence,
    controllers: Sequence,
    workdirs: Sequence[str],
    num_epochs: Optional[int] = None,
    min_epochs: Optional[int] = None,
    seed: int = 0,
    log_every: int = 1,
) -> List[FitResult]:
    """Train K folds of one encoder in lockstep; returns per-fold
    FitResults identical to K sequential :func:`fit_single` runs."""
    K = len(states)
    assert K == len(fold_train) == len(fold_val) == len(processors) \
        == len(controllers) == len(workdirs)
    mc = cfg.model_config(method)
    num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
    min_epochs = min_epochs if min_epochs is not None else cfg.min_epochs
    min_epochs = min(min_epochs, num_epochs)

    make_clf, weighted = _clf_factory(cfg, method)
    clf_w = jnp.stack([
        jnp.asarray(compute_class_weights(jnp.asarray(d["labels"]),
                                          cfg.class_num))
        if weighted else jnp.ones((cfg.class_num,))
        for d in fold_train
    ])  # (K, C)
    mask_loss_fn = get_mask_loss_fn(cfg, method)
    spec = build_group_spec(states[0].params, mc.use_backbone,
                            cfg.reference_compat)

    def fold_step(state, batch, rng, hp, active, w):
        raw = make_single_train_step(cfg, method, model, make_clf(w),
                                     mask_loss_fn, spec, donate=False,
                                     jit_compile=False)
        new_state, metrics = raw(state, batch, rng, hp)
        keep = jax.tree.map(lambda n, o: jnp.where(active, n, o),
                            new_state, state)
        return keep, metrics

    mstep = jax.jit(jax.vmap(fold_step), donate_argnums=(0,))

    def fold_eval(state, batch, w):
        logits, aux, mask_pred = model.apply(
            state.variables, batch["imgs"], train=False)
        _, metrics = compute_single_losses(
            cfg, method, make_clf(w), mask_loss_fn, logits, aux, mask_pred,
            batch["imgs"], batch.get("masks"), batch["labels"],
            jnp.ones(()), is_train=False, valid=batch.get("valid"),
        )
        metrics["loss"] = metrics["clf_loss"]
        return logits, jax.nn.softmax(logits, axis=-1), metrics

    meval = jax.jit(jax.vmap(fold_eval))

    schedulers = [make_scheduler(mc.scheduler, mc.optimizer.lr)
                  for _ in range(K)]
    earlies = [EarlyStopping(mode=cfg.early_stopping.mode,
                             patience=cfg.early_stopping.patience,
                             min_delta=cfg.early_stopping.min_delta)
               for _ in range(K)]
    ckpts = [BestCheckpointer(f"{wd}/checkpoints", monitor="val_acc",
                              mode="max") for wd in workdirs]
    loggers = [MetricLogger(f"{wd}/logs") for wd in workdirs]

    train_dss = [ArrayDataset(imgs=d["imgs"], masks=d.get("masks"),
                              labels=d["labels"], adc=d.get("adc"))
                 for d in fold_train]
    val_imgs = [np.asarray(p.eval_split(v["imgs"], adc=v.get("adc")))
                for p, v in zip(processors, fold_val)]
    val_dss = [ArrayDataset(imgs=vi, masks=v.get("masks"),
                            labels=v["labels"])
               for vi, v in zip(val_imgs, fold_val)]

    # per-fold rng streams, identical to each fold's sequential run
    rngs = [jax.random.PRNGKey(seed) for _ in range(K)]
    np_rngs = [np.random.RandomState(seed) for _ in range(K)]

    stacked = stack_fold_states(list(states))
    done = [False] * K
    histories: List[list] = [[] for _ in range(K)]
    best_states: List[Optional[TrainState]] = [None] * K
    # cache of each fold's most recent processed batch — persists across
    # epochs so a stopped fold always has a (discarded, active=0) filler
    last_proc: List[Optional[dict]] = [None] * K

    for epoch in range(num_epochs):
        if all(done):
            break
        t0 = time.time()
        for c in controllers:
            c.on_epoch_start(epoch)
        hp_stack = jax.tree.map(
            lambda *x: jnp.stack(x), *[c.hyperparams() for c in controllers])
        aux_w = aux_loss_weight(epoch, cfg.aux_loss_weight_epoch_limit,
                                cfg.use_simple_aux_loss_scheduling)

        # ---- train: lockstep over the longest fold epoch ----
        iters = [
            iter(iterate_batches(train_dss[i], cfg.batch_size, shuffle=True,
                                 rng=np_rngs[i], pad_to_batch=True))
            if not done[i] else iter(())
            for i in range(K)
        ]
        meters = [dict() for _ in range(K)]  # type: List[Dict[str, MeanMetric]]
        while True:
            per_fold, active, weights = [], [], []
            for i in range(K):
                nxt = None if done[i] else next(iters[i], None)
                if nxt is not None:
                    # split exactly like the fold's sequential run
                    rngs[i], aug_key, drop_key = jax.random.split(rngs[i], 3)
                    proc = {
                        "imgs": processors[i].train_batch(
                            aug_key, nxt["imgs"], adc=nxt.get("adc")),
                        "labels": nxt["labels"].astype(jnp.int32),
                        "aux_w": jnp.asarray(aux_w, jnp.float32),
                        "valid": nxt["valid"].astype(jnp.float32),
                        "_drop": drop_key,
                    }
                    if "masks" in nxt:
                        proc["masks"] = nxt["masks"]
                    last_proc[i] = proc
                    active.append(1.0)
                    weights.append(float(np.asarray(nxt["valid"]).sum()))
                else:
                    active.append(0.0)   # exhausted/stopped: discarded step
                    weights.append(0.0)
                per_fold.append(last_proc[i])
            if not any(active):
                break
            drop_keys = jnp.stack([p.pop("_drop") if "_drop" in p
                                   else jax.random.PRNGKey(0)
                                   for p in per_fold])
            batch = jax.tree.map(lambda *x: jnp.stack(x), *per_fold)
            stacked, metrics = mstep(stacked, batch, drop_keys,
                                     hp_stack, jnp.asarray(active), clf_w)
            metrics = jax.device_get(metrics)
            for i in range(K):
                if active[i]:
                    for k, v in metrics.items():
                        meters[i].setdefault(k, MeanMetric()).update(
                            float(np.asarray(v)[i]), weight=weights[i])

        # ---- validation (lockstep; stopped folds computed + ignored) ----
        val_iters = [iter(iterate_batches(val_dss[i], cfg.batch_size,
                                          shuffle=False, pad_to_batch=True))
                     for i in range(K)]
        vmeters = [dict() for _ in range(K)]
        probs_acc = [[] for _ in range(K)]
        labels_acc = [[] for _ in range(K)]
        last_v: List[Optional[dict]] = [None] * K
        while True:
            per_fold, have = [], []
            for i in range(K):
                nxt = next(val_iters[i], None)
                if nxt is not None:
                    proc = {"imgs": nxt["imgs"],
                            "labels": nxt["labels"].astype(jnp.int32),
                            "valid": nxt["valid"].astype(jnp.float32)}
                    if "masks" in nxt:
                        proc["masks"] = nxt["masks"]
                    last_v[i] = proc
                    have.append(True)
                else:
                    have.append(False)
                per_fold.append(last_v[i])
            if not any(have):
                break
            batch = jax.tree.map(lambda *x: jnp.stack(x), *per_fold)
            _, probs, metrics = meval(stacked, batch, clf_w)
            probs = np.asarray(probs)
            metrics = jax.device_get(metrics)
            for i in range(K):
                if not have[i] or done[i]:
                    continue
                valid = np.asarray(per_fold[i]["valid"]).astype(bool)
                probs_acc[i].append(probs[i][valid])
                labels_acc[i].append(
                    np.asarray(per_fold[i]["labels"])[valid])
                for k, v in metrics.items():
                    vmeters[i].setdefault(k, MeanMetric()).update(
                        float(np.asarray(v)[i]), weight=valid.sum())

        # ---- per-fold control plane (identical to fit_single) ----
        host_state = None
        for i in range(K):
            if done[i]:
                continue
            em = {f"train_{k}": m.compute() for k, m in meters[i].items()}
            em.update({f"val_{k}": m.compute() for k, m in vmeters[i].items()})
            em.update(classification_report(
                np.concatenate(probs_acc[i]),
                np.concatenate(labels_acc[i]).astype(np.int64),
                cfg.class_num, "val_"))
            em["lr_scale"] = controllers[i].lr_scale
            em["aux_w"] = aux_w
            em["epoch_time"] = time.time() - t0
            hp_i = controllers[i].hyperparams()
            em["group_lrs"] = np.asarray(hp_i.lr).tolist()
            em["group_trainable"] = np.asarray(hp_i.trainable).tolist()

            if isinstance(schedulers[i], ReduceLROnPlateau):
                monitored = em.get(mc.scheduler.monitor, em["val_loss"])
                if schedulers[i].step_reduced(monitored):
                    controllers[i].apply_plateau(schedulers[i].factor,
                                                 schedulers[i].min_lr)
            else:
                controllers[i].lr_scale = schedulers[i].step_scale(epoch)

            if host_state is None:
                host_state = jax.device_get(stacked)
            fold_state = index_fold_state(host_state, i)
            if ckpts[i].maybe_save(fold_state, em, epoch):
                best_states[i] = fold_state
            histories[i].append(em)
            if epoch % log_every == 0:
                loggers[i].log_epoch(epoch, em)

            stop_metric = em.get(cfg.early_stopping.metric)
            if stop_metric is not None and earlies[i].step(stop_metric):
                if epoch + 1 >= min_epochs:
                    done[i] = True

    for lg in loggers:
        lg.close()
    final = jax.device_get(stacked)
    return [
        FitResult(state=index_fold_state(final, i),
                  best_state=best_states[i],
                  history=histories[i],
                  train_metrics=histories[i][-1] if histories[i] else {})
        for i in range(K)
    ]

"""Epoch-level training loop for single-modality encoders.

Replaces ``pl.Trainer.fit`` + ``LightningSingleModel`` orchestration
(run_training.py:103-131, train.py): compiled train/eval steps on device, a
thin metric-driven control loop on the host (plateau LR, early stopping,
min_epochs, unfreeze timer, aux-loss weight schedule, best-checkpointing).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.modality import ModalityProcessor
from ..data.pipeline import ArrayDataset, device_data_auto, iterate_batches
from ..evals.metrics import MeanMetric, classification_report
from ..losses import get_classification_loss_fn, get_mask_loss_fn
from ..utils.checkpoint import BestCheckpointer, RollingSaver
from ..utils.logging import MetricLogger
from .optim import build_group_spec
from .schedule import (
    EarlyStopping,
    ReduceLROnPlateau,
    WarmupCosine,
    aux_loss_weight,
    make_scheduler,
)
from .single import make_single_eval_step, make_single_train_step
from .state import TrainState


@dataclasses.dataclass
class FitResult:
    state: TrainState
    best_state: Optional[TrainState]
    history: list
    train_metrics: Dict[str, float]


def init_single_state(cfg: Config, model, sample_batch, seed: int = 0) -> TrainState:
    from ..utils.init import init_on_cpu

    variables = init_on_cpu(
        lambda: model.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed + 1)},
            sample_batch,
            train=False,
        )
    )
    return TrainState.create(variables)


def _setup_spmd(cfg: Config, state: TrainState, raw_step, mesh):
    """Shard the TrainState and wrap an (unjitted) train step as an SPMD
    program over ``mesh``; identity when ``mesh`` is None.

    Returns ``(state, step, batch_sharding, n_data)``.  Batches are placed
    directly into their data-axis sharding so XLA GSPMD inserts the gradient
    all-reduce (and the TP collectives) — the scaling design of SURVEY §2.10.
    """
    if mesh is None:
        return state, raw_step, None, 1
    from ..parallel import (
        batch_sharding,
        make_spmd_step,
        shard_state,
        state_shardings,
    )

    n_data = int(mesh.shape[cfg.parallel.data_axis])
    if cfg.batch_size % n_data:
        raise ValueError(
            f"batch_size={cfg.batch_size} must divide over the "
            f"{n_data}-way data axis"
        )
    state_sh = state_shardings(state, mesh)
    state = shard_state(state, mesh)
    jitted, place = make_spmd_step(
        raw_step, mesh, state_sh, donate=cfg.parallel.donate_train_state
    )

    def step(state, batch, rng, hp):
        return jitted(state, place(batch), rng, hp)

    return state, step, batch_sharding(mesh), n_data


def _warn_nonfinite(metrics: Dict[str, float], epoch: int, step: int) -> None:
    """Host-side NaN/Inf-gradient warning (train.py:229-233 equivalent)."""
    n = metrics.get("grad_nonfinite", 0)
    if n and n > 0:
        print(
            f"[dmf_tpu] WARNING: {int(n)} non-finite gradient entries at "
            f"epoch {epoch} step {step} (grad_norm="
            f"{metrics.get('grad_norm', float('nan')):.3e})"
        )


def fit_single(
    cfg: Config,
    method: str,
    model,
    state: TrainState,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    processor: ModalityProcessor,
    controller,
    workdir: str,
    clf_loss_fn=None,
    num_epochs: Optional[int] = None,
    min_epochs: Optional[int] = None,
    seed: int = 0,
    log_every: int = 1,
    viz_every: int = 10,
    resume_from: Optional[str] = None,
    mesh=None,
) -> FitResult:
    """Train one encoder; returns final + best states and epoch history.

    ``train_data``/``val_data``: dicts with raw (un-processed) ``imgs``,
    optional ``masks`` (already mask_target_size), ``labels``.
    ``resume_from``: path of a saved state (msgpack) to restore before
    training (the reference's load_pretrained path, run.py:136-151).
    ``mesh``: a ``jax.sharding.Mesh`` — when given, the TrainState is sharded
    per the TP rules, batches ride the data axis, and the compiled step runs
    SPMD with XLA-inserted collectives (the reference is single-device;
    this is the v5e-8 scaling path, SURVEY.md §2.10).
    """
    mc = cfg.model_config(method)
    num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
    min_epochs = min_epochs if min_epochs is not None else cfg.min_epochs
    min_epochs = min(min_epochs, num_epochs)

    if clf_loss_fn is None:
        clf_loss_fn = get_classification_loss_fn(cfg, train_data["labels"], method)
    mask_loss_fn = get_mask_loss_fn(cfg, method)

    spec = build_group_spec(
        state.params, mc.use_backbone, cfg.reference_compat
    )
    if cfg.debug_training:
        # optimizer-group dump, selector_helpers.py:336-353 equivalent
        from .optim import describe_groups

        print(describe_groups(state.params, spec, controller.hyperparams()))
    train_step = make_single_train_step(
        cfg, method, model, clf_loss_fn, mask_loss_fn, spec,
        jit_compile=(mesh is None),
    )
    eval_step = make_single_eval_step(cfg, method, model, clf_loss_fn, mask_loss_fn)

    scheduler = make_scheduler(mc.scheduler, mc.optimizer.lr)
    early = EarlyStopping(
        mode=cfg.early_stopping.mode,
        patience=cfg.early_stopping.patience,
        min_delta=cfg.early_stopping.min_delta,
    )
    ckpt = BestCheckpointer(f"{workdir}/checkpoints", monitor="val_acc", mode="max")
    roll = RollingSaver(f"{workdir}/checkpoints")
    logger = MetricLogger(f"{workdir}/logs")

    if resume_from is not None:
        from ..utils.checkpoint import load_checkpoint

        state = load_checkpoint(resume_from, jax.device_get(state))
        if mesh is None:
            state = jax.device_put(state)
    state, train_step, batch_sh, n_data = _setup_spmd(cfg, state, train_step, mesh)

    train_ds = ArrayDataset(
        imgs=train_data["imgs"], masks=train_data.get("masks"),
        labels=train_data["labels"], adc=train_data.get("adc"),
    )
    global_step = 0
    # eval inputs are deterministic: process once (chunked — bounds device
    # memory on large splits), reuse every epoch
    val_imgs = np.asarray(processor.eval_split(val_data["imgs"],
                                               adc=val_data.get("adc")))
    val_ds = ArrayDataset(
        imgs=val_imgs, masks=val_data.get("masks"), labels=val_data["labels"]
    )
    # HBM-resident data (auto on TPU when the split fits): removes the
    # per-step host->device batch transfer; mesh runs keep the sharded
    # host-prefetch path
    stage_data = mesh is None and device_data_auto(train_ds, cfg.device_data)
    stage_val = mesh is None and device_data_auto(val_ds, cfg.device_data)

    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.RandomState(seed)
    history = []
    best_state = None

    for epoch in range(num_epochs):
        t0 = time.time()
        controller.on_epoch_start(epoch)
        hp = controller.hyperparams()
        aux_w = aux_loss_weight(
            epoch, cfg.aux_loss_weight_epoch_limit, cfg.use_simple_aux_loss_scheduling
        )

        # ---- train ----
        # Tail batches run at their exact short size (one extra XLA compile,
        # shape stable across epochs) — the reference's DataLoader
        # drop_last=False semantics: the short batch's loss mean and BN
        # statistics cover each tail sample exactly once.  Under a mesh the
        # tail is instead padded up to the next multiple of the data axis
        # (sharding requires it) and the step receives the per-sample
        # ``valid`` mask: loss/metric reductions and train-mode BN moments
        # are validity-weighted (losses/weighting.py, layers.py
        # bn_sample_weight), so the duplicated rows drop out exactly —
        # parity with the single-device short-batch step is tested at
        # tests/test_spmd_loop.py (TestTailBatchSemantics).
        train_meters: Dict[str, MeanMetric] = {}
        pending = []  # (device metrics, valid) per step; ONE epoch-end sync
        epoch_step0 = global_step
        for batch in iterate_batches(
            train_ds, cfg.batch_size, shuffle=True, rng=np_rng,
            native=cfg.use_native_loader, device=stage_data,
            pad_to_batch=False, pad_to_multiple=n_data, sharding=batch_sh,
        ):
            if isinstance(scheduler, WarmupCosine):
                # the reference registers this scheduler with
                # interval='step' (selector_helpers.py:319-330)
                controller.lr_scale = scheduler.step_scale(global_step)
                hp = controller.hyperparams()
            global_step += 1
            rng, aug_key, drop_key = jax.random.split(rng, 3)
            proc = {
                "imgs": processor.train_batch(aug_key, batch["imgs"],
                                              adc=batch.get("adc")),
                "labels": batch["labels"].astype(jnp.int32),
                "aux_w": jnp.asarray(aux_w, jnp.float32),
            }
            if n_data > 1:  # padded-tail mask (exact semantics, see above)
                proc["valid"] = batch["valid"].astype(jnp.float32)
            if "masks" in batch:
                proc["masks"] = batch["masks"]
            if cfg.debug_training and global_step == 1:
                # first-batch normalization check (train.py:1074-1079)
                from ..utils.logging import input_stats

                print(input_stats(proc["imgs"], proc.get("masks")))
            state, metrics = train_step(state, proc, drop_key, hp)
            # defer the metrics transfer: a per-step device_get costs a
            # host round trip per step (an RTT over a tunneled TPU) and
            # blocks dispatch pipelining; scalars are fetched in ONE
            # epoch-end sync below
            pending.append((metrics, batch["valid"]))
        for i, (metrics, valid) in enumerate(jax.device_get(pending)):
            _warn_nonfinite(metrics, epoch, epoch_step0 + i + 1)
            # weight by the number of unique samples: step metrics are
            # means over valid rows (padded duplicates already excluded),
            # so the epoch meter is the exact per-sample mean
            w = float(np.asarray(valid).sum())
            for k, v in metrics.items():
                train_meters.setdefault(k, MeanMetric()).update(float(v), weight=w)

        epoch_metrics = {f"train_{k}": m.compute() for k, m in train_meters.items()}
        # wall time of the train phase alone (host pipeline + augment +
        # transfer + step) — the e2e-vs-bare-step comparison in
        # ``bench.py --train-e2e`` reads this
        epoch_metrics["train_time"] = time.time() - t0

        # ---- validation ----
        val_meters: Dict[str, MeanMetric] = {}
        all_probs, all_labels = [], []
        for batch in iterate_batches(val_ds, cfg.batch_size, shuffle=False,
                                     device=stage_val, sharding=batch_sh):
            proc = {"imgs": batch["imgs"],
                    "labels": batch["labels"].astype(jnp.int32),
                    # exact padded-tail val metrics (make_single_eval_step)
                    "valid": batch["valid"].astype(jnp.float32)}
            if "masks" in batch:
                proc["masks"] = batch["masks"]
            logits, probs, metrics = eval_step(state, proc)
            valid = np.asarray(batch["valid"]).astype(bool)
            all_probs.append(np.asarray(probs)[valid])
            all_labels.append(np.asarray(batch["labels"])[valid])
            for k, v in metrics.items():
                val_meters.setdefault(k, MeanMetric()).update(
                    float(v), weight=valid.sum()
                )
        probs = np.concatenate(all_probs)
        labels = np.concatenate(all_labels).astype(np.int64)
        epoch_metrics.update({f"val_{k}": m.compute() for k, m in val_meters.items()})
        epoch_metrics.update(classification_report(probs, labels, cfg.class_num, "val_"))
        epoch_metrics["lr_scale"] = controller.lr_scale
        epoch_metrics["aux_w"] = aux_w
        epoch_metrics["epoch_time"] = time.time() - t0
        # per-group lr/trainable used this epoch — the reference's
        # LearningRateMonitor(logging_interval='epoch') analogue
        # (run_training.py:36) and what epoch-scale parity tests pin
        epoch_metrics["group_lrs"] = np.asarray(hp.lr).tolist()
        epoch_metrics["group_trainable"] = np.asarray(hp.trainable).tolist()

        # ---- control plane ----
        if isinstance(scheduler, ReduceLROnPlateau):
            monitored = epoch_metrics.get(mc.scheduler.monitor,
                                          epoch_metrics["val_loss"])
            # torch semantics: a reduction event mutates the lr of each
            # group present in the optimizer (controller.apply_plateau);
            # groups unfrozen later join at their fresh lr
            if scheduler.step_reduced(monitored):
                controller.apply_plateau(scheduler.factor, scheduler.min_lr)
        elif not isinstance(scheduler, WarmupCosine):  # stepped per-step above
            controller.lr_scale = scheduler.step_scale(epoch)

        # ---- periodic mask visualization (train.py:706-714, every 10 ep) ----
        if (
            viz_every
            and mc.mask.enabled
            and epoch % viz_every == 0
            and val_data.get("masks") is not None
        ):
            try:
                from ..utils.visualize import visualize_mask_triplet

                # with a mesh, gather the variables once — a 1-sample eager
                # forward across sharded params would bounce collectives
                viz_vars = (jax.device_get(state.variables)
                            if mesh is not None else state.variables)
                _, _, mask_pred = model.apply(
                    viz_vars, jnp.asarray(val_imgs[:1]), train=False
                )
                visualize_mask_triplet(
                    val_imgs[0], val_data["masks"][0],
                    np.asarray(mask_pred[0]),
                    f"{workdir}/viz/epoch_{epoch:04d}.png",
                    title_prefix=f"Epoch {epoch}, sample: ",
                )
            except Exception:
                pass

        if ckpt.maybe_save(jax.device_get(state), epoch_metrics, epoch):
            best_state = jax.device_get(state)
        if viz_every and epoch % max(viz_every, 1) == 0:
            # rolling resume checkpoint (async orbax; overlaps next epoch)
            roll.save(jax.device_get(state))

        history.append(epoch_metrics)
        if epoch % log_every == 0:
            logger.log_epoch(epoch, epoch_metrics)

        stop_metric = epoch_metrics.get(cfg.early_stopping.metric)
        if stop_metric is not None and early.step(stop_metric):
            if epoch + 1 >= min_epochs:
                break

    roll.wait()
    logger.close()
    train_metrics = history[-1] if history else {}
    return FitResult(
        state=state, best_state=best_state, history=history,
        train_metrics=train_metrics,
    )


def fit_fusion(
    cfg: Config,
    dwi_model,
    dce_model,
    fusion_model,
    state: TrainState,
    train_data: Dict[str, np.ndarray],
    val_data: Dict[str, np.ndarray],
    workdir: str,
    clf_loss_fn=None,
    num_epochs: Optional[int] = None,
    min_epochs: Optional[int] = None,
    seed: int = 0,
    log_every: int = 1,
    viz_every: int = 10,
    mesh=None,
) -> FitResult:
    """Fusion training epoch loop (run_training.py:181-263 equivalent).

    ``train_data``/``val_data``: dicts with **processed** ``dwi`` and ``dce``
    image stacks (the reference trains fusion from cached post-transform
    tensors, prepare_single_model.py:154-174), optional ``masks``, and
    ``labels``.  ``mesh`` enables the SPMD path (see :func:`fit_single`).
    Mask triptychs render every ``viz_every`` epochs from the fused mask head
    (the single-stage hook at train.py:706-714, which the reference never
    wired for fusion).
    """
    from ..losses import get_mask_loss_fn as _get_mask
    from .fusion import (
        build_fusion_group_spec,
        make_fusion_eval_step,
        make_fusion_train_step,
    )
    from .optim import FusionOptController

    fp = cfg.fusion_model
    num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
    min_epochs = min_epochs if min_epochs is not None else cfg.min_epochs
    min_epochs = min(min_epochs, num_epochs)

    if clf_loss_fn is None:
        clf_loss_fn = get_classification_loss_fn(cfg, train_data["labels"], "fusion")
    mask_loss_fn = _get_mask(cfg, "fusion")

    spec = build_fusion_group_spec(state.params, cfg)
    controller = FusionOptController(cfg)
    if cfg.debug_training:
        from .optim import describe_groups

        print(describe_groups(state.params, spec, controller.hyperparams()))
    train_step = make_fusion_train_step(
        cfg, dwi_model, dce_model, fusion_model, clf_loss_fn, mask_loss_fn,
        spec, jit_compile=(mesh is None),
    )
    eval_step = make_fusion_eval_step(
        cfg, dwi_model, dce_model, fusion_model, clf_loss_fn, mask_loss_fn
    )
    state, train_step, batch_sh, n_data = _setup_spmd(cfg, state, train_step, mesh)

    scheduler = make_scheduler(fp.scheduler, fp.optimizer.lr)
    early = EarlyStopping(
        mode=cfg.early_stopping.mode,
        patience=cfg.early_stopping.patience,
        min_delta=cfg.early_stopping.min_delta,
    )
    ckpt = BestCheckpointer(f"{workdir}/checkpoints", monitor="val_acc", mode="max")
    roll = RollingSaver(f"{workdir}/checkpoints")
    logger = MetricLogger(f"{workdir}/logs")

    train_ds = ArrayDataset(
        dwi=train_data["dwi"], dce=train_data["dce"],
        masks=train_data.get("masks"), labels=train_data["labels"],
    )
    val_ds = ArrayDataset(
        dwi=val_data["dwi"], dce=val_data["dce"],
        masks=val_data.get("masks"), labels=val_data["labels"],
    )
    # HBM-resident data (see fit_single)
    stage_data = mesh is None and device_data_auto(train_ds, cfg.device_data)
    stage_val = mesh is None and device_data_auto(val_ds, cfg.device_data)

    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.RandomState(seed)
    history = []
    best_state = None
    global_step = 0

    for epoch in range(num_epochs):
        t0 = time.time()
        controller.on_epoch_start(epoch)
        controller.lr_scale = getattr(controller, "lr_scale", 1.0)
        hp = controller.hyperparams()
        aux_w = aux_loss_weight(
            epoch, cfg.aux_loss_weight_epoch_limit, cfg.use_simple_aux_loss_scheduling
        )

        train_meters: Dict[str, MeanMetric] = {}
        pending = []  # (device metrics, valid); ONE epoch-end sync
        epoch_step0 = global_step
        for batch in iterate_batches(train_ds, cfg.batch_size, shuffle=True,
                                     rng=np_rng,
                                     native=cfg.use_native_loader,
                                     device=stage_data,
                                     pad_to_batch=False,
                                     pad_to_multiple=n_data,
                                     sharding=batch_sh):
            if isinstance(scheduler, WarmupCosine):
                # reference interval='step' (selector_helpers.py:319-330)
                controller.lr_scale = scheduler.step_scale(global_step)
                hp = controller.hyperparams()
            global_step += 1
            rng, drop_key = jax.random.split(rng)
            proc = {
                "dwi": batch["dwi"], "dce": batch["dce"],
                "labels": batch["labels"].astype(jnp.int32),
                "aux_w": jnp.asarray(aux_w, jnp.float32),
            }
            if n_data > 1:  # padded-tail mask (exact semantics, fit_single)
                proc["valid"] = batch["valid"].astype(jnp.float32)
            if "masks" in batch:
                proc["masks"] = batch["masks"]
            if cfg.debug_training and global_step == 1:
                from ..utils.logging import input_stats

                print(input_stats(proc["dwi"], proc.get("masks")))
            state, metrics = train_step(state, proc, drop_key, hp)
            # deferred metrics transfer (see fit_single): no per-step sync
            pending.append((metrics, batch["valid"]))
        for i, (metrics, valid) in enumerate(jax.device_get(pending)):
            _warn_nonfinite(metrics, epoch, epoch_step0 + i + 1)
            w = float(np.asarray(valid).sum())
            for k, v in metrics.items():
                train_meters.setdefault(k, MeanMetric()).update(float(v), weight=w)
        epoch_metrics = {f"train_{k}": m.compute() for k, m in train_meters.items()}
        # train-phase wall time (see fit_single; read by bench --train-e2e)
        epoch_metrics["train_time"] = time.time() - t0

        val_meters: Dict[str, MeanMetric] = {}
        all_probs, all_labels = [], []
        for batch in iterate_batches(val_ds, cfg.batch_size, shuffle=False,
                                     device=stage_val, sharding=batch_sh):
            proc = {
                "dwi": batch["dwi"], "dce": batch["dce"],
                "labels": batch["labels"].astype(jnp.int32),
                # exact padded-tail val metrics (make_fusion_eval_step)
                "valid": batch["valid"].astype(jnp.float32),
            }
            if "masks" in batch:
                proc["masks"] = batch["masks"]
            logits, probs, metrics = eval_step(state, proc)
            valid = np.asarray(batch["valid"]).astype(bool)
            all_probs.append(np.asarray(probs)[valid])
            all_labels.append(np.asarray(batch["labels"])[valid])
            for k, v in metrics.items():
                val_meters.setdefault(k, MeanMetric()).update(
                    float(v), weight=valid.sum()
                )
        probs = np.concatenate(all_probs)
        labels = np.concatenate(all_labels).astype(np.int64)
        epoch_metrics.update({f"val_{k}": m.compute() for k, m in val_meters.items()})
        epoch_metrics.update(classification_report(probs, labels, cfg.class_num, "val_"))
        epoch_metrics["lr_scale"] = controller.lr_scale
        epoch_metrics["aux_w"] = aux_w
        epoch_metrics["epoch_time"] = time.time() - t0
        # per-group lr/trainable used this epoch (LearningRateMonitor
        # analogue; see fit_single)
        epoch_metrics["group_lrs"] = np.asarray(hp.lr).tolist()
        epoch_metrics["group_trainable"] = np.asarray(hp.trainable).tolist()

        if isinstance(scheduler, ReduceLROnPlateau):
            monitored = epoch_metrics.get(fp.scheduler.monitor,
                                          epoch_metrics["val_loss"])
            if scheduler.step_reduced(monitored):
                controller.apply_plateau(scheduler.factor, scheduler.min_lr)
        elif not isinstance(scheduler, WarmupCosine):  # stepped per-step above
            controller.lr_scale = scheduler.step_scale(epoch)

        # ---- periodic fused-mask visualization (the train.py:706-714 hook
        # the reference leaves single-model-only; rendered here from the
        # fused mask head every viz_every epochs) ----
        if (
            viz_every
            and cfg.fusion_model.mask.enabled
            and epoch % viz_every == 0
            and val_data.get("masks") is not None
        ):
            try:
                from ..utils.visualize import visualize_mask_triplet
                from .fusion import make_fusion_apply

                viz_apply = make_fusion_apply(dwi_model, dce_model, fusion_model)
                host_state = jax.device_get(state)
                variables = {
                    m: {"params": host_state.params[m],
                        "batch_stats": host_state.batch_stats[m]}
                    for m in ("dwi", "dce", "fusion")
                }
                _, fused_mask, _, _, _ = viz_apply(
                    variables, jnp.asarray(val_data["dwi"][:1]),
                    jnp.asarray(val_data["dce"][:1]), train=False,
                )
                visualize_mask_triplet(
                    val_data["dwi"][0], val_data["masks"][0],
                    np.asarray(fused_mask[0]),
                    f"{workdir}/viz/epoch_{epoch:04d}.png",
                    title_prefix=f"Epoch {epoch}, fused mask: ",
                )
            except Exception:
                pass

        if ckpt.maybe_save(jax.device_get(state), epoch_metrics, epoch):
            best_state = jax.device_get(state)
        if viz_every and epoch % max(viz_every, 1) == 0:
            roll.save(jax.device_get(state))
        history.append(epoch_metrics)
        if epoch % log_every == 0:
            logger.log_epoch(epoch, epoch_metrics)

        stop_metric = epoch_metrics.get(cfg.early_stopping.metric)
        if stop_metric is not None and early.step(stop_metric):
            if epoch + 1 >= min_epochs:
                break

    roll.wait()
    logger.close()
    return FitResult(
        state=state, best_state=best_state, history=history,
        train_metrics=history[-1] if history else {},
    )

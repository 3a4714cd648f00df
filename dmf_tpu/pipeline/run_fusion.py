"""Fusion preparation + runner.

Behavior-compatible redesign of ``prepare_fusion_model``
(prepare_fusion_model.py:13-113) and ``run_fusion_model``
(run_training.py:181-333): paired processed splits from the single-model
cache, FusionModel over the trained encoders, gradual-unfreeze training,
best-reload, TTA x MC test, per-fold state-dict store.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, to_reference_dict
from ..data.pipeline import ArrayDataset, iterate_batches
from ..evals import classification_report, make_fusion_predictor
from ..losses import get_classification_loss_fn
from ..models import FusionModel
from ..train import TrainState, adamw_init, fit_fusion
from ..utils.checkpoint import save_pytree
from ..utils.logging import save_metrics_json
from .paths import prepare_output_paths
from .prepare_single import load_processed_split


def prepare_fusion_data(
    cfg: Config, fold: int, processed_dir: Optional[str] = None
) -> Dict[str, Dict[str, np.ndarray]]:
    """Assemble paired (dwi, dce, masks, labels) splits from the processed
    cache (masks/labels stored only under the dwi key, deduped like
    prepare_single_model.py:160-174)."""
    processed_dir = processed_dir or os.path.join(cfg.base_path, "processed")
    out = {}
    for split in ("train", "val", "test"):
        dwi = load_processed_split(
            os.path.join(processed_dir, f"dwi{fold}{split}data")
        )
        dce = load_processed_split(
            os.path.join(processed_dir, f"dce{fold}{split}data")
        )
        out[split] = {
            "dwi": dwi["imgs"],
            "dce": dce["imgs"],
            "masks": dwi.get("masks"),
            "labels": dwi.get("labels"),
        }
    return out


def build_fusion_state(
    cfg: Config,
    dwi_model,
    dwi_state: TrainState,
    dce_model,
    dce_state: TrainState,
    fusion_model: Optional[FusionModel] = None,
    sample_dwi: Optional[jnp.ndarray] = None,
    sample_dce: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
):
    """Construct FusionModel + combined TrainState from trained encoders
    (prepare_fusion_model.py:71-79)."""
    if fusion_model is None:
        fusion_model = FusionModel(config=cfg.fusion_model,
                                   num_classes=cfg.class_num, dtype=dtype)
    S = cfg.dwi_model.input_size
    if sample_dwi is None:
        sample_dwi = jnp.zeros((2, S, S, cfg.dwi_channel_num))
    if sample_dce is None:
        sample_dce = jnp.zeros((2, S, S, cfg.dce_channel_num))

    from ..utils.init import init_on_cpu

    def init_fusion():
        _, dwi_aux, dwi_m = dwi_model.apply(dwi_state.variables, sample_dwi,
                                            train=False)
        _, dce_aux, dce_m = dce_model.apply(dce_state.variables, sample_dce,
                                            train=False)
        return fusion_model.init(
            {"params": jax.random.PRNGKey(cfg.seed),
             "dropout": jax.random.PRNGKey(cfg.seed + 1)},
            dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
            train=False,
        )

    fusion_vars = init_on_cpu(init_fusion)
    params = {
        "dwi": dwi_state.params,
        "dce": dce_state.params,
        "fusion": fusion_vars["params"],
    }
    batch_stats = {
        "dwi": dwi_state.batch_stats,
        "dce": dce_state.batch_stats,
        "fusion": fusion_vars.get("batch_stats", {}),
    }
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=adamw_init(params),
                       step=jnp.zeros((), jnp.int32))
    return fusion_model, state


def test_fusion_model(
    cfg: Config, dwi_model, dce_model, fusion_model, state: TrainState,
    test_data: Dict[str, np.ndarray], seed: int = 0, int8: bool = False,
    calibration_data: Optional[Dict[str, np.ndarray]] = None,
    mesh=None,
) -> Dict[str, Any]:
    """TTA x MC fusion test (train_fusion.py:342-434 semantics), plus the
    gating-weight aggregation reported as modality attention.

    ``int8=True`` serves the ensemble on the post-training-quantized conv
    path (ops/quant.py) — an opt-in deployment mode, not reference behavior.
    Activation scales are calibrated on ``calibration_data`` (pass held-out
    train/val volumes so the test set never influences the served model's
    quantization parameters); when None, the first test batch is used as a
    last resort for standalone calls.

    ``mesh``: optional ``jax.sharding.Mesh`` — variables shard per the TP
    rules and test batches ride the data axis (SPMD serving, VERDICT r2 #5).
    """
    t_start = time.time()
    batch_sh = None
    if mesh is not None:
        from ..parallel import batch_sharding, shard_state

        state = shard_state(jax.device_get(state), mesh)
        batch_sh = batch_sharding(mesh)
    ds = ArrayDataset(dwi=test_data["dwi"], dce=test_data["dce"],
                      labels=test_data["labels"])
    rng = jax.random.PRNGKey(seed)
    all_probs, all_labels, all_std, gating = [], [], [], []
    variables = {
        m: {"params": state.params[m], "batch_stats": state.batch_stats[m]}
        for m in ("dwi", "dce", "fusion")
    }
    fwd_override = None
    if int8:
        from ..ops.quant import (
            make_quantized_fusion_apply,
            make_quantized_fusion_fwd,
        )

        calib_src = calibration_data if calibration_data is not None else test_data
        nc = min(len(calib_src["dwi"]), 8)
        _, qsets = make_quantized_fusion_apply(
            dwi_model, dce_model, fusion_model, variables,
            calibration=(jnp.asarray(calib_src["dwi"][:nc]),
                         jnp.asarray(calib_src["dce"][:nc])),
            # mc/tta_mc serving runs dropout hot; calibrate with it active
            # so inverted-dropout scaling doesn't clip (ops/quant.py)
            calibration_mc=cfg.test_mode in ("mc", "tta_mc"),
            calibration_rng=jax.random.PRNGKey(seed + 1),
        )
        fwd_override = make_quantized_fusion_fwd(
            dwi_model, dce_model, fusion_model, qsets)
    # data-parallel meshes serve under shard_map (fused serving kernels run
    # per shard); TP meshes keep GSPMD propagation (see make_fusion_predictor)
    predictor = make_fusion_predictor(cfg, dwi_model, dce_model, fusion_model,
                                      fwd_override=fwd_override, mesh=mesh)
    for batch in iterate_batches(ds, cfg.batch_size, shuffle=False,
                                 sharding=batch_sh):
        rng, sub = jax.random.split(rng)
        mean_probs, std_probs, aux = predictor(
            variables["dwi"], variables["dce"], variables["fusion"],
            batch["dwi"], batch["dce"], sub,
        )
        valid = np.asarray(batch["valid"]).astype(bool)
        all_probs.append(np.asarray(mean_probs)[valid])
        all_std.append(np.asarray(std_probs)[valid])
        all_labels.append(np.asarray(batch["labels"])[valid])
        gw = aux.get("gating_weights")
        if gw is not None:
            # under tta/tta_mc the aux batch axis is (views*B): average the
            # views back out before masking
            gw = np.asarray(gw).reshape(-1, len(valid), gw.shape[-1]).mean(0)
            gating.append(gw[valid].mean(axis=0))

    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels).astype(np.int64)
    metrics = classification_report(probs, labels, cfg.class_num, "test_")
    if cfg.test_mode != "normal":
        metrics["test_uncertainty_mean"] = float(np.concatenate(all_std).mean())
    # wall-clock report, model_test.py:103+198-199 parity
    metrics["test_time_sec"] = round(time.time() - t_start, 3)
    return {
        "metrics": metrics,
        "probs": probs,
        "labels": labels,
        "modality_attention": np.stack(gating) if gating else None,
    }


def run_fusion_model(
    cfg: Config,
    fold: int,
    dwi_results: Dict[str, Any],
    dce_results: Dict[str, Any],
    fusion_data: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    num_epochs: Optional[int] = None,
    min_epochs: Optional[int] = None,
    base_dir: str = "results",
    seed: int = 0,
) -> Dict[str, Any]:
    """Full fusion flow for one fold (run_training.py:181-333)."""
    paths = prepare_output_paths("fusion", fold, base_dir)
    if fusion_data is None:
        fusion_data = prepare_fusion_data(cfg, fold)

    dwi_model, dwi_state = dwi_results["model"], dwi_results["state"]
    dce_model, dce_state = dce_results["model"], dce_results["state"]

    S = cfg.dwi_model.input_size
    fusion_model, state = build_fusion_state(
        cfg, dwi_model, dwi_state, dce_model, dce_state,
        sample_dwi=jnp.asarray(fusion_data["train"]["dwi"][:2]),
        sample_dce=jnp.asarray(fusion_data["train"]["dce"][:2]),
    )

    clf_loss_fn = get_classification_loss_fn(
        cfg, fusion_data["train"]["labels"], "fusion"
    )
    from ..parallel import mesh_from_config

    fit = fit_fusion(
        cfg, dwi_model, dce_model, fusion_model, state,
        train_data=fusion_data["train"],
        val_data=fusion_data["val"],
        workdir=paths["root"],
        clf_loss_fn=clf_loss_fn,
        num_epochs=num_epochs,
        min_epochs=min_epochs,
        seed=seed,
        mesh=mesh_from_config(cfg),
    )
    best_state = fit.best_state if fit.best_state is not None else fit.state
    test_result = test_fusion_model(
        cfg, dwi_model, dce_model, fusion_model, best_state,
        fusion_data["test"], seed=seed,
        # int8 calibration (when enabled downstream) must never see test data
        calibration_data=fusion_data["val"],
        mesh=mesh_from_config(cfg),
    )
    save_metrics_json(
        paths["metrics"], fit.train_metrics, test_result["metrics"],
        parameters=to_reference_dict(cfg),
    )
    # per-fold combined state store (run_training.py:317-326 equivalent)
    save_pytree(
        os.path.join(paths["checkpoints"], f"fusion_fold{fold}"),
        jax.device_get(best_state.params),
    )

    return {
        "best_checkpoint": f"{paths['checkpoints']}/best",
        "fusion_model": fusion_model,
        "dwi_model": dwi_model,
        "dce_model": dce_model,
        "state": best_state,
        "final_state": fit.state,
        "train_metrics": fit.train_metrics,
        "test_metrics": test_result["metrics"],
        "test_probs": test_result["probs"],
        "modality_attention": test_result["modality_attention"],
        "history": fit.history,
    }


def fusion_model_test(
    cfg: Config, dwi_model, dce_model, fusion_model, state: TrainState,
    test_data: Dict[str, np.ndarray], seed: int = 0, int8: bool = False,
    calibration_data: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, Any]:
    """Standalone fusion evaluation — API-parity alias for the reference's
    manual eval loop (model_test.py:99-202); delegates to the compiled
    TTA x MC test path (optionally on the int8 serving path)."""
    return test_fusion_model(cfg, dwi_model, dce_model, fusion_model, state,
                             test_data, seed, int8=int8,
                             calibration_data=calibration_data)

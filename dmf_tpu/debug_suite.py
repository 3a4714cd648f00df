"""Pre-training debug/verification harness.

Behavior-compatible redesign of the reference's runtime smoke suite
(debug_suite.py:7-215), gated by ``debug_training`` (run_training.py:77-87):
synthetic-batch forward/loss checks, regularizer magnitude sanity,
MC-dropout variance, TTA sensitivity, TTA-MC >= MC variance, predict-path
cross-consistency, metric computability.  The fusion variant — an
unimplemented stub in the reference (debug_suite.py:218-219) — is fully
implemented here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .evals import classification_report, make_fusion_predictor, make_single_predictor
from .losses import get_classification_loss_fn, get_mask_loss_fn
from .models import Encoder, FusionModel
from .train.single import compute_single_losses


def _check(ok: bool, name: str, detail: str = "") -> bool:
    status = "PASS" if ok else "FAIL"
    print(f"  [{status}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def _debug_model_cfg(cfg: Config, method: str):
    """Shrink the model for the smoke test so it runs in seconds anywhere
    (the reference runs the full model on a synthetic batch; on CPU that
    takes minutes — the invariants don't depend on width)."""
    mc = cfg.model_config(method)
    if mc.use_backbone:
        mc = dataclasses.replace(mc, use_backbone=False)
    mc = dataclasses.replace(
        mc, channels=(8, 16, 32), input_size=64, proj_dim=8,
        transformer_embed_dim=32, transformer_depth=1, transformer_heads=2,
    )
    return mc


def run_debug_suite_single(cfg: Config, method: str, seed: int = 0) -> bool:
    print(f"[debug-suite] single model, method={method}")
    mc = _debug_model_cfg(cfg, method)
    chan = cfg.channel_num(method)
    model = Encoder(method=method, config=mc, channel_num=chan,
                    num_classes=cfg.class_num)

    rng = np.random.RandomState(seed)
    B, S = 2, mc.input_size
    x = jnp.asarray(rng.rand(B, S, S, chan).astype(np.float32))
    masks = jnp.asarray(
        (rng.rand(B, *mc.mask.mask_target_size, 1) > 0.5).astype(np.float32)
    )
    labels = jnp.asarray(rng.randint(0, cfg.class_num, B), jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        x, train=False,
    )

    ok = True

    # 1. forward shapes (debug_suite.py:30-33)
    logits, aux, mask_pred = model.apply(variables, x, train=False)
    ok &= _check(logits.shape == (B, cfg.class_num), "forward logits shape",
                 str(logits.shape))
    ok &= _check(
        mask_pred is not None
        and mask_pred.shape[-3:-1] == tuple(mc.mask.mask_target_size),
        "mask prediction shape", str(None if mask_pred is None else mask_pred.shape),
    )

    # 2. shared-step loss finite (debug_suite.py:35-38)
    clf = get_classification_loss_fn(cfg, np.asarray(labels), method)
    mask_fn = get_mask_loss_fn(cfg, method)
    smcfg = cfg.replace(**{f"{method}_model": mc}) if method in ("dwi", "dce") else cfg
    loss, metrics = compute_single_losses(
        smcfg, method, clf, mask_fn, logits, aux, mask_pred, x, masks, labels,
        jnp.ones(()), is_train=True,
    )
    ok &= _check(bool(np.isfinite(float(loss))), "train loss finite",
                 f"{float(loss):.4f}")

    # 3. regularizer magnitudes (debug_suite.py:40-127)
    feat_norm = float(metrics.get("feat_norm_loss", 0.0))
    ok &= _check(0.0 <= feat_norm < 1e4, "feat-norm regularizer magnitude",
                 f"{feat_norm:.4f}")

    # 4. MC-dropout variance (debug_suite.py:140-153)
    mc_pred = make_single_predictor(cfg, model, mode="mc", mc_passes=8)
    _, std_mc, _ = mc_pred(variables, x, jax.random.PRNGKey(7))
    mc_var = float(np.asarray(std_mc).mean())
    ok &= _check(mc_var > 1e-8, "MC dropout produces variance",
                 f"mean std {mc_var:.3e} (dropout may NOT be active if 0)")

    # 5. TTA changes predictions (debug_suite.py:157-166)
    normal = make_single_predictor(cfg, model, mode="normal")
    tta = make_single_predictor(cfg, model, mode="tta")
    mn, _, _ = normal(variables, x, jax.random.PRNGKey(0))
    mt, _, _ = tta(variables, x, jax.random.PRNGKey(0))
    diff = float(np.abs(np.asarray(mn) - np.asarray(mt)).max())
    ok &= _check(diff > 1e-7, "TTA changes predictions", f"max diff {diff:.3e}")

    # 6. TTA-MC variance vs MC (debug_suite.py:170-177)
    tta_mc = make_single_predictor(cfg, model, mode="tta_mc", mc_passes=8)
    _, std_tm, _ = tta_mc(variables, x, jax.random.PRNGKey(7))
    tm_var = float(np.asarray(std_tm).mean())
    ok &= _check(tm_var >= 0.5 * mc_var, "TTA-MC variance >= MC variance",
                 f"{tm_var:.3e} vs {mc_var:.3e}")

    # 7. predict-path cross-consistency (debug_suite.py:182-199): the tta
    # dispatch must agree with a manual average over views
    from .evals.predict import tta_views

    views_logits, _, _ = model.apply(variables, tta_views(x), train=False)
    manual = jax.nn.softmax(views_logits, axis=-1).reshape(4, B, -1).mean(0)
    cross = float(np.abs(np.asarray(manual) - np.asarray(mt)).max())
    ok &= _check(cross < 1e-3, "predict paths consistent",
                 f"max diff {cross:.3e}")

    # 8. metrics computable (debug_suite.py:203-213)
    rep = classification_report(np.asarray(mt), np.asarray(labels),
                                cfg.class_num, "dbg_")
    ok &= _check(all(np.isfinite(v) for v in rep.values()), "metrics compute")

    print(f"[debug-suite] single {method}: {'ALL PASS' if ok else 'FAILURES'}")
    return bool(ok)


def run_debug_suite_fusion(cfg: Config, seed: int = 0) -> bool:
    """Fusion smoke suite (the reference left this as a stub)."""
    print("[debug-suite] fusion model")
    dwi_mc = _debug_model_cfg(cfg, "dwi")
    dce_mc = _debug_model_cfg(cfg, "dce")
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific,
        fusion_channels=16,
        dwi_out_channels=dwi_mc.channels[-1],
        dce_out_channels=dce_mc.channels[-1],
    )
    fusion_mc = dataclasses.replace(dwi_mc, fusion_specific=fs)

    dwi = Encoder(method="dwi", config=dwi_mc,
                  channel_num=cfg.dwi_channel_num, num_classes=cfg.class_num)
    dce = Encoder(method="dce", config=dce_mc,
                  channel_num=cfg.dce_channel_num, num_classes=cfg.class_num)
    fusion = FusionModel(config=fusion_mc, num_classes=cfg.class_num)

    rng = np.random.RandomState(seed)
    B, S = 4, dwi_mc.input_size
    xd = jnp.asarray(rng.rand(B, S, S, cfg.dwi_channel_num).astype(np.float32))
    xc = jnp.asarray(rng.rand(B, S, S, cfg.dce_channel_num).astype(np.float32))
    k = {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)}
    dwi_vars = dwi.init(k, xd, train=False)
    dce_vars = dce.init(k, xc, train=False)
    _, dwi_aux, dwi_m = dwi.apply(dwi_vars, xd, train=False)
    _, dce_aux, dce_m = dce.apply(dce_vars, xc, train=False)
    fusion_vars = fusion.init(k, dwi_aux["raw_feats"], dce_aux["raw_feats"],
                              dwi_m, dce_m, train=False)

    ok = True
    logits, fused_mask, aux = fusion.apply(
        fusion_vars, dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
        train=False,
    )
    ok &= _check(logits.shape == (B, cfg.class_num), "fusion logits shape")
    ok &= _check(
        fused_mask.shape[-3:-1] == tuple(fusion_mc.mask.mask_target_size),
        "fused mask shape",
    )
    gw = np.asarray(aux["gating_weights"])
    ok &= _check(np.allclose(gw.sum(axis=1), 1.0, atol=1e-5),
                 "gating weights sum to 1", str(gw.mean(axis=0)))

    predictor = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc",
                                      mc_passes=4)
    m, s, _ = predictor(dwi_vars, dce_vars, fusion_vars, xd, xc,
                        jax.random.PRNGKey(3))
    ok &= _check(bool(np.all(np.isfinite(np.asarray(m)))),
                 "fusion TTA-MC finite")
    ok &= _check(float(np.asarray(s).mean()) > 1e-8,
                 "fusion MC variance present",
                 f"{float(np.asarray(s).mean()):.3e}")

    print(f"[debug-suite] fusion: {'ALL PASS' if ok else 'FAILURES'}")
    return bool(ok)

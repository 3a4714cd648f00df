"""Multi-step training-trajectory parity vs the GENUINE reference.

The strongest AUC-parity proxy obtainable without the Kaggle dataset
(VERDICT r2 next-round #2): drive the actual reference training stack —
``LightningSingleModel._shared_step`` (train.py:294-428, the real composite
loss path), ``LightningOptimizerFactory`` grouping + discriminative-LR AdamW
(selector_helpers.py:119-353), and the genuine ``ModelMaskHeadBackbone`` —
for several identical-batch steps against dmf_tpu's compiled train step
started from the SAME imported weights, and assert the per-step losses and
the post-training eval logits agree.  Dropout is 0 in both so the only
degrees of freedom are the loss math, BatchNorm running-stat updates, and
the AdamW recursion — exactly the dynamics that compound into AUC.

pytorch_lightning / torchmetrics are not installed here; minimal inert
stubs satisfy train.py's imports (metric objects and ``self.log`` feed
logging only — the returned batch_loss and the optimizer step, which is
what we compare, never flow through them).
"""

import dataclasses
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmf_tpu.config import default_parameters, to_reference_dict
from dmf_tpu.models import Encoder
from dmf_tpu.models.ref_ckpt import import_reference_encoder

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


class _Metric:
    """Inert torchmetrics stand-in (update/compute feed logging only)."""

    def __init__(self, *a, **k):
        pass

    def cpu(self):
        return self

    def to(self, *a, **k):
        return self

    def update(self, *a, **k):
        pass

    def reset(self):
        pass

    def compute(self):
        return torch.tensor(0.0)


def _install_stubs():
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.current_epoch = 0
                self.global_step = 0

            @property
            def device(self):
                return torch.device("cpu")

            def log(self, *a, **k):
                pass

            def log_dict(self, *a, **k):
                pass

            def save_hyperparameters(self, *a, **k):
                pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.MeanMetric = _Metric
        cls = types.ModuleType("torchmetrics.classification")
        for name in ("MulticlassAUROC", "MulticlassPrecision",
                     "MulticlassRecall", "MulticlassF1Score",
                     "MulticlassConfusionMatrix"):
            setattr(tm, name, _Metric)
            setattr(cls, name, _Metric)
        seg = types.ModuleType("torchmetrics.segmentation")
        seg.DiceScore = _Metric
        tm.classification = cls
        tm.segmentation = seg
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.classification"] = cls
        sys.modules["torchmetrics.segmentation"] = seg
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


@pytest.fixture(scope="module")
def ref_stack():
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model_module
    import selector_helpers
    import train as ref_train

    return model_module, selector_helpers, ref_train


from tests.test_importers import _randomize, t_in  # noqa: E402


def tiny_cfg():
    cfg = default_parameters()
    mc = dataclasses.replace(
        cfg.dwi_model, channels=(8, 16, 32), input_size=32,
        use_backbone=False, proj_dim=4, dropout=0.0, use_se=True,
        enable_modality_attention=True,
    )
    return cfg.replace(dwi_model=mc, dce_model=mc)


N_STEPS = 6
B = 6


def _make_batches(cfg, seed=0):
    rng = np.random.RandomState(seed)
    C = cfg.dwi_channel_num
    batches = []
    for _ in range(N_STEPS):
        batches.append({
            "imgs": rng.rand(B, 32, 32, C).astype(np.float32),
            "masks": (rng.rand(B, 32, 32, 1) > 0.7).astype(np.float32),
            "labels": (rng.permutation(B) % cfg.class_num).astype(np.int64),
        })
    return batches


def _run_reference(ref_stack, refd, ref_model, batches, train_labels):
    """N genuine _shared_step + AdamW steps; returns (losses, final logits)."""
    mm, sh, tr = ref_stack
    factory = sh.LightningOptimizerFactory(
        model=ref_model, parameters=refd, model_type="dwi"
    )
    criterion = sh.get_classification_loss(
        refd, torch.tensor(train_labels), "dwi", torch.device("cpu")
    )
    lm = tr.LightningSingleModel(
        model=ref_model, method="dwi", criterion_clf=criterion,
        optimizer_fn=factory.optimizer_fn, scheduler_fn=None,
        parameters_dict=refd, paths=None,
    )
    opt = lm.configure_optimizers()
    assert isinstance(opt, torch.optim.AdamW)
    lm.train()
    losses = []
    for i, b in enumerate(batches):
        batch = (t_in(b["imgs"]), t_in(b["masks"]),
                 torch.tensor(b["labels"]))
        opt.zero_grad()
        loss = lm._shared_step(batch, i + 1, "train")
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    lm.eval()
    with torch.no_grad():
        logits, _, _ = ref_model(t_in(batches[0]["imgs"]))
    return losses, logits.numpy()


def _run_ours(cfg, ref_sd, batches, train_labels):
    """Same steps through dmf_tpu's compiled train step from the imported
    initial weights; returns (losses, final logits)."""
    from dmf_tpu.losses import (
        get_classification_loss_fn,
        get_mask_loss_fn,
    )
    from dmf_tpu.train import (
        SingleModelOptController,
        TrainState,
        build_group_spec,
        make_single_train_step,
    )

    C = cfg.dwi_channel_num
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                    num_classes=cfg.class_num)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 32, 32, C)), train=False,
    )
    variables = import_reference_encoder(ref_sd, template)
    variables = jax.tree.map(jnp.asarray, variables)
    state = TrainState.create(variables)

    clf = get_classification_loss_fn(cfg, np.asarray(train_labels), "dwi")
    mask_fn = get_mask_loss_fn(cfg, "dwi")
    spec = build_group_spec(state.params, cfg.dwi_model.use_backbone,
                            cfg.reference_compat)
    step = make_single_train_step(cfg, "dwi", model, clf, mask_fn, spec,
                                  donate=False)
    hp = SingleModelOptController(cfg, "dwi").hyperparams()
    losses = []
    for i, b in enumerate(batches):
        batch = {
            "imgs": jnp.asarray(b["imgs"]),
            "masks": jnp.asarray(b["masks"]),
            "labels": jnp.asarray(b["labels"], jnp.int32),
            "aux_w": jnp.asarray(1.0, jnp.float32),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i), hp)
        losses.append(float(metrics["loss"]))
    logits, _, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batches[0]["imgs"]), train=False,
    )
    return losses, np.asarray(logits)


def fusion_tiny_cfg():
    cfg = tiny_cfg()
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=32, dce_out_channels=32,
    )
    fmc = dataclasses.replace(cfg.dwi_model, fusion_specific=fs)
    return cfg.replace(fusion_model=fmc)


def _make_fusion_batches(cfg, seed=0):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(N_STEPS):
        batches.append({
            "dwi": rng.rand(B, 32, 32, cfg.dwi_channel_num).astype(np.float32),
            "dce": rng.rand(B, 32, 32, cfg.dce_channel_num).astype(np.float32),
            "masks": (rng.rand(B, 32, 32, 1) > 0.7).astype(np.float32),
            "labels": (rng.permutation(B) % cfg.class_num).astype(np.int64),
        })
    return batches


def _run_reference_fusion(refd, dwi_m, dce_m, fus_m, batches, train_labels):
    """N genuine LightningFusionModel._shared_step + grouped-AdamW steps.

    The module builds its own LightningFusionOptimizerFactory internally
    (train_fusion.py:122-133) — the same gradual-unfreeze grouping the
    production run uses."""
    import selector_helpers as sh
    import train_fusion as trf

    criterion = sh.get_classification_loss(
        refd, torch.tensor(train_labels), "fusion", torch.device("cpu")
    )
    lm = trf.LightningFusionModel(
        dwi_model=dwi_m, dce_model=dce_m, fusion_model=fus_m,
        parameters_dict=refd, criterion_clf=criterion,
        optimizer_fn=None, scheduler_fn=None, paths=None,
    )
    opt = lm.configure_optimizers()
    if isinstance(opt, dict):  # internal factory supplies a plateau sched
        opt = opt["optimizer"]
    assert isinstance(opt, torch.optim.AdamW)
    lm.train()
    losses = []
    for b in batches:
        batch = (t_in(b["dwi"]), t_in(b["dce"]), t_in(b["masks"]),
                 torch.tensor(b["labels"]))
        opt.zero_grad()
        loss = lm._shared_step(batch, "train")
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    lm.eval()
    with torch.no_grad():
        b0 = batches[0]
        _, d_aux, d_mask = dwi_m(t_in(b0["dwi"]))
        _, c_aux, c_mask = dce_m(t_in(b0["dce"]))
        logits, _, _ = fus_m(d_aux["raw_feats"], c_aux["raw_feats"],
                             d_mask, c_mask)
    return losses, logits.numpy()


def _run_ours_fusion(cfg, sds, batches, train_labels):
    """Same steps through make_fusion_train_step from the imported initial
    weights (the flagship SPMD-capable step, run unsharded here)."""
    from dmf_tpu.losses import get_classification_loss_fn, get_mask_loss_fn
    from dmf_tpu.models import FusionModel
    from dmf_tpu.models.ref_ckpt import import_reference_fusion
    from dmf_tpu.train import FusionOptController, TrainState, adamw_init
    from dmf_tpu.train.fusion import (
        build_fusion_group_spec,
        make_fusion_train_step,
    )

    k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    dwi = Encoder(method="dwi", config=cfg.dwi_model,
                  channel_num=cfg.dwi_channel_num, num_classes=cfg.class_num)
    dce = Encoder(method="dce", config=cfg.dce_model,
                  channel_num=cfg.dce_channel_num, num_classes=cfg.class_num)
    fusion = FusionModel(config=cfg.fusion_model, num_classes=cfg.class_num)

    xd = jnp.zeros((2, 32, 32, cfg.dwi_channel_num))
    xc = jnp.zeros((2, 32, 32, cfg.dce_channel_num))
    dwi_t = dwi.init(k, xd, train=False)
    dce_t = dce.init(k, xc, train=False)
    _, d_aux, d_m = dwi.apply(dwi_t, xd, train=False)
    _, c_aux, c_m = dce.apply(dce_t, xc, train=False)
    fus_t = fusion.init(k, d_aux["raw_feats"], c_aux["raw_feats"], d_m, c_m,
                        train=False)

    dwi_v = jax.tree.map(jnp.asarray,
                         import_reference_encoder(sds["dwi"], dwi_t))
    dce_v = jax.tree.map(jnp.asarray,
                         import_reference_encoder(sds["dce"], dce_t))
    fus_v = jax.tree.map(jnp.asarray,
                         import_reference_fusion(sds["fusion"], fus_t))

    params = {"dwi": dwi_v["params"], "dce": dce_v["params"],
              "fusion": fus_v["params"]}
    batch_stats = {"dwi": dwi_v.get("batch_stats", {}),
                   "dce": dce_v.get("batch_stats", {}),
                   "fusion": fus_v.get("batch_stats", {})}
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=adamw_init(params),
                       step=jnp.zeros((), jnp.int32))

    clf = get_classification_loss_fn(cfg, np.asarray(train_labels), "fusion")
    spec = build_fusion_group_spec(state.params, cfg)
    step = make_fusion_train_step(cfg, dwi, dce, fusion, clf,
                                  get_mask_loss_fn(cfg, "fusion"), spec,
                                  donate=False)
    hp = FusionOptController(cfg).hyperparams()
    losses = []
    for i, b in enumerate(batches):
        batch = {
            "dwi": jnp.asarray(b["dwi"]),
            "dce": jnp.asarray(b["dce"]),
            "masks": jnp.asarray(b["masks"]),
            "labels": jnp.asarray(b["labels"], jnp.int32),
            "aux_w": jnp.asarray(1.0, jnp.float32),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i), hp)
        losses.append(float(metrics["loss"]))

    b0 = batches[0]
    dv = {"params": state.params["dwi"],
          "batch_stats": state.batch_stats["dwi"]}
    cv = {"params": state.params["dce"],
          "batch_stats": state.batch_stats["dce"]}
    fv = {"params": state.params["fusion"],
          "batch_stats": state.batch_stats["fusion"]}
    _, d_aux, d_m = dwi.apply(dv, jnp.asarray(b0["dwi"]), train=False)
    _, c_aux, c_m = dce.apply(cv, jnp.asarray(b0["dce"]), train=False)
    logits, _, _ = fusion.apply(fv, d_aux["raw_feats"], c_aux["raw_feats"],
                                d_m, c_m, train=False)
    return losses, np.asarray(logits)


class TestTrajectoryParity:
    def test_six_step_training_dynamics_match(self, ref_stack):
        """Per-step composite losses and post-training logits match the
        genuine reference stack over 6 AdamW steps (<=1e-3 rel)."""
        mm = ref_stack[0]
        cfg = tiny_cfg()
        refd = to_reference_dict(cfg)
        ref_model = mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        _randomize(ref_model, seed=21)

        batches = _make_batches(cfg)
        train_labels = np.concatenate([b["labels"] for b in batches])

        # snapshot BEFORE torch training mutates the module in place
        sd0 = {k: v.clone() for k, v in ref_model.state_dict().items()}
        ref_model.eval()
        with torch.no_grad():
            logits0 = ref_model(t_in(batches[0]["imgs"]))[0].numpy()
        t_losses, t_logits = _run_reference(ref_stack, refd, ref_model,
                                            batches, train_labels)
        j_losses, j_logits = _run_ours(cfg, sd0, batches, train_labels)

        # aux_w: reference used current_epoch=0 => aux_w == 1.0, ours passed
        # 1.0 explicitly; losses must track step by step
        np.testing.assert_allclose(j_losses, t_losses, rtol=1e-3,
                                   err_msg=f"ref={t_losses} ours={j_losses}")
        # the trajectory must actually move: post-training logits differ
        # measurably from the pre-training ones (guards against a vacuous
        # pass where neither optimizer updates anything)
        denom = np.abs(t_logits).max() + 1e-8
        assert np.abs(t_logits - logits0).max() / denom > 1e-2
        rel = np.abs(j_logits - t_logits).max() / denom
        assert rel < 1e-3, f"post-training logits diverged: rel={rel}"

    def test_fusion_six_step_training_dynamics_match(self, ref_stack):
        """The FLAGSHIP stack: genuine LightningFusionModel (dual
        ModelMaskHeadBackbone encoders + reference FusionModel + the
        internal LightningFusionOptimizerFactory grouping,
        train_fusion.py:204-330, selector_helpers.py:357+) vs
        make_fusion_train_step from identical imported weights — per-step
        composite losses and post-training fusion logits over 6 steps."""
        mm = ref_stack[0]
        cfg = fusion_tiny_cfg()
        refd = to_reference_dict(cfg)
        dwi_m = mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        dce_m = mm.ModelMaskHeadBackbone("dce", refd, backbone=None)
        fus_m = mm.FusionModel(refd)
        _randomize(dwi_m, seed=31)
        _randomize(dce_m, seed=32)
        _randomize(fus_m, seed=33)

        batches = _make_fusion_batches(cfg)
        train_labels = np.concatenate([b["labels"] for b in batches])
        sds = {
            "dwi": {k: v.clone() for k, v in dwi_m.state_dict().items()},
            "dce": {k: v.clone() for k, v in dce_m.state_dict().items()},
            "fusion": {k: v.clone() for k, v in fus_m.state_dict().items()},
        }
        for m in (dwi_m, dce_m, fus_m):
            m.eval()
        with torch.no_grad():
            b0 = batches[0]
            _, d_aux, d_mask = dwi_m(t_in(b0["dwi"]))
            _, c_aux, c_mask = dce_m(t_in(b0["dce"]))
            logits0 = fus_m(d_aux["raw_feats"], c_aux["raw_feats"],
                            d_mask, c_mask)[0].numpy()

        t_losses, t_logits = _run_reference_fusion(refd, dwi_m, dce_m, fus_m,
                                                   batches, train_labels)
        j_losses, j_logits = _run_ours_fusion(cfg, sds, batches, train_labels)

        np.testing.assert_allclose(j_losses, t_losses, rtol=1e-3,
                                   err_msg=f"ref={t_losses} ours={j_losses}")
        denom = np.abs(t_logits).max() + 1e-8
        assert np.abs(t_logits - logits0).max() / denom > 1e-2
        rel = np.abs(j_logits - t_logits).max() / denom
        assert rel < 1e-3, f"post-training fusion logits diverged: rel={rel}"

"""Fusion training end-to-end smoke test (tiny shapes, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.config import default_parameters
from dmf_tpu.models import Encoder, FusionModel
from dmf_tpu.train import TrainState, fit_fusion


def tiny_cfg():
    cfg = default_parameters(batch_size=8, mc_passes=2, unfreeze_timer=2)
    mc = dataclasses.replace(
        cfg.dwi_model, channels=(8, 16, 32), input_size=32,
        use_backbone=False, proj_dim=8, dropout=0.1,
    )
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=32, dce_out_channels=32,
    )
    fmc = dataclasses.replace(mc, fusion_specific=fs)
    return cfg.replace(dwi_model=mc, dce_model=mc, fusion_model=fmc)


@pytest.fixture(scope="module")
def fusion_run(tmp_path_factory):
    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    n = 24
    dwi = rng.rand(n, 32, 32, 5).astype(np.float32)
    dce = rng.rand(n, 32, 32, 6).astype(np.float32)
    masks = (rng.rand(n, 32, 32, 1) > 0.8).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int64)

    dwi_model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=5,
                        num_classes=4)
    dce_model = Encoder(method="dce", config=cfg.dce_model, channel_num=6,
                        num_classes=4)
    fusion_model = FusionModel(config=cfg.fusion_model, num_classes=4)

    k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    dwi_vars = dwi_model.init(k, jnp.zeros((2, 32, 32, 5)), train=False)
    dce_vars = dce_model.init(k, jnp.zeros((2, 32, 32, 6)), train=False)
    _, dwi_aux, dwi_m = dwi_model.apply(dwi_vars, jnp.asarray(dwi[:2]),
                                        train=False)
    _, dce_aux, dce_m = dce_model.apply(dce_vars, jnp.asarray(dce[:2]),
                                        train=False)
    fusion_vars = fusion_model.init(
        k, dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
        train=False,
    )
    from dmf_tpu.train import adamw_init

    params = {"dwi": dwi_vars["params"], "dce": dce_vars["params"],
              "fusion": fusion_vars["params"]}
    batch_stats = {"dwi": dwi_vars["batch_stats"],
                   "dce": dce_vars["batch_stats"],
                   "fusion": fusion_vars["batch_stats"]}
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=adamw_init(params),
                       step=jnp.zeros((), jnp.int32))

    tr = slice(0, 16)
    va = slice(16, 24)
    result = fit_fusion(
        cfg, dwi_model, dce_model, fusion_model, state,
        train_data={"dwi": dwi[tr], "dce": dce[tr], "masks": masks[tr],
                    "labels": labels[tr]},
        val_data={"dwi": dwi[va], "dce": dce[va], "masks": masks[va],
                  "labels": labels[va]},
        workdir=str(tmp_path_factory.mktemp("fusion")),
        num_epochs=3, min_epochs=1,
    )
    return cfg, result


class TestFitFusion:
    def test_history_and_finiteness(self, fusion_run):
        cfg, result = fusion_run
        assert len(result.history) == 3
        for rec in result.history:
            for k in ["train_loss", "train_mask_loss", "train_recon_loss",
                      "train_mimic_loss", "val_loss", "val_roc_auc",
                      "train_grad_norm", "train_fusion_grad_norm"]:
                assert np.isfinite(rec[k]), (k, rec[k])

    def test_encoders_frozen_at_start(self, fusion_run):
        cfg, result = fusion_run
        # with unfreeze_timer=2 and 3 epochs, only the deepest encoder group
        # (block3+other) unfroze at epoch 2; block1 moments must stay zero
        mu_dwi_b1 = result.state.opt_state.mu["dwi"]["block1"]
        assert all(np.all(np.asarray(x) == 0) for x in jax.tree.leaves(mu_dwi_b1))
        mu_fusion = result.state.opt_state.mu["fusion"]
        assert any(np.any(np.asarray(x) != 0) for x in jax.tree.leaves(mu_fusion))

    def test_deep_group_unfroze_at_timer(self, fusion_run):
        cfg, result = fusion_run
        mu_dwi_b3 = result.state.opt_state.mu["dwi"]["block3"]
        assert any(np.any(np.asarray(x) != 0) for x in jax.tree.leaves(mu_dwi_b3))

"""End-to-end single-modality training smoke test (tiny shapes, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.config import default_parameters
from dmf_tpu.data import make_synthetic_arrays, train_val_indices
from dmf_tpu.data.modality import ModalityProcessor
from dmf_tpu.data.preprocess import prep_dwi_adc_maps
from dmf_tpu.models import Encoder
from dmf_tpu.ops.resize import resize_nearest
from dmf_tpu.train import (
    SingleModelOptController,
    TrainState,
    fit_single,
    init_single_state,
)


def tiny_cfg():
    cfg = default_parameters(
        batch_size=8,
        num_epochs=3,
        patience=50,
        segnum=4,
        reference_compat=True,
    )
    mc = dataclasses.replace(
        cfg.dwi_model,
        channels=(8, 16, 32),
        input_size=32,
        use_backbone=False,
        proj_dim=8,
        dropout=0.1,
        # 10x the reference lr so the 3-epoch loss trend is signal, not
        # dropout-rng noise (random labels train slowly at 1e-4)
        optimizer=dataclasses.replace(cfg.dwi_model.optimizer, lr=1e-3),
    )
    return cfg.replace(dwi_model=mc)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    cfg = tiny_cfg()
    raw = make_synthetic_arrays(n_train=48, n_test=8, image_size=32, seed=1)
    tr, va = train_val_indices(raw["labels"], cfg.segnum, cfg.class_num, 0)
    masks32 = np.asarray(
        resize_nearest(jnp.asarray(raw["masks"]), (32, 32))
    )
    adc = prep_dwi_adc_maps(raw["dwi"][tr], raw["dwi_test"],
                            cfg.dwi_bvals_to_use)
    proc = ModalityProcessor(cfg, "dwi", adc_map=adc[0])
    model = Encoder(
        method="dwi", config=cfg.dwi_model, channel_num=cfg.dwi_channel_num,
        num_classes=cfg.class_num,
    )
    sample = jnp.zeros((2, 32, 32, cfg.dwi_channel_num))
    state = init_single_state(cfg, model, sample)
    controller = SingleModelOptController(cfg, "dwi")
    workdir = str(tmp_path_factory.mktemp("run"))
    result = fit_single(
        cfg, "dwi", model, state,
        train_data={"imgs": raw["dwi"][tr], "masks": masks32[tr],
                    "labels": raw["labels"][tr]},
        val_data={"imgs": raw["dwi"][va], "masks": masks32[va],
                  "labels": raw["labels"][va]},
        processor=proc, controller=controller, workdir=workdir,
        num_epochs=3, min_epochs=1,
    )
    return cfg, result


class TestFitSingle:
    def test_history_complete(self, trained):
        cfg, result = trained
        assert len(result.history) == 3
        for rec in result.history:
            for k in ["train_loss", "train_acc", "val_loss", "val_acc",
                      "val_roc_auc", "val_f1", "train_mask_loss",
                      "train_recon_loss", "train_mimic_loss"]:
                assert k in rec, k
                assert np.isfinite(rec[k]), (k, rec[k])

    def test_loss_decreases(self, trained):
        cfg, result = trained
        first = result.history[0]["train_loss"]
        last = result.history[-1]["train_loss"]
        assert last < first, (first, last)

    def test_best_checkpoint_saved(self, trained):
        cfg, result = trained
        assert result.best_state is not None

    def test_params_updated_but_cls_head_frozen_in_compat(self, trained):
        cfg, result = trained
        # reference compat: the single-model classification head is excluded
        # from every optimizer group (selector_helpers.py:161-162)
        s = result.state
        assert s.step > 0
        head = s.params["classification_head"]["Dense_0"]["kernel"]
        mu_head = s.opt_state.mu["classification_head"]["Dense_0"]["kernel"]
        assert np.all(np.asarray(mu_head) == 0)
        blk = s.opt_state.mu["block1"]
        any_nonzero = any(
            np.any(np.asarray(x) != 0) for x in jax.tree.leaves(blk)
        )
        assert any_nonzero

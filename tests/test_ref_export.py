"""Reverse-migration exporter tests against the GENUINE reference modules.

The inverse direction of test_ref_ckpt.py: build OUR Flax models with random
weights, export with ``models.ref_ckpt.export_reference_*``, load the result
into the actual reference modules (imported from /root/reference at test
time) with ``load_state_dict(strict=True)``, and assert the torch forwards
reproduce the Flax forwards — the exact path a dmf_tpu user takes to hand a
trained model back to a reference user.  Also pins the pure
export->import round trip (lossless transposes) and the Lightning on-disk
format.  Skipped when the reference tree isn't mounted.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmf_tpu.config import default_parameters, resolve_backbone_config, to_reference_dict
from dmf_tpu.models import Encoder, FusionModel
from dmf_tpu.models.ref_ckpt import (
    export_reference_encoder,
    export_reference_fusion,
    import_reference_encoder,
    import_reference_fusion,
    load_lightning_ckpt,
    save_lightning_ckpt,
)

# reuse the genuine-module fixture, tiny config and tolerance helper so the
# two migration directions can't drift apart
from tests.test_ref_ckpt import assert_close, ref_mm, tiny_cfg  # noqa: F401
from tests.test_importers import t_in  # noqa: E402

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _randomize_variables(variables, seed):
    """Random but well-conditioned values for every leaf (BN var positive,
    scales near 1) so forward parity exercises real weight content."""
    rng = np.random.RandomState(seed)

    def f(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = 0.1 * rng.standard_normal(np.shape(leaf)).astype(np.float32)
        if name == "var":
            arr = np.abs(arr) + 0.5
        elif name == "scale":
            arr = arr + 1.0
        return arr

    return jax.tree_util.tree_map_with_path(f, variables)


def _to_torch_sd(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}


def _init_encoder(cfg, x, backbone=None, seed=0):
    model = Encoder(method="dwi", config=cfg.dwi_model,
                    channel_num=x.shape[-1], num_classes=cfg.class_num,
                    backbone=backbone)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    return model, _randomize_variables(template, seed)


class TestEncoderExport:
    def test_custom_encoder_export(self, ref_mm):
        """Ours -> genuine custom encoder: strict load + forward parity +
        lossless export->import round trip."""
        cfg = tiny_cfg()
        B, S, C = 2, 32, cfg.dwi_channel_num
        x = np.random.RandomState(0).rand(B, S, S, C).astype(np.float32)
        model, variables = _init_encoder(cfg, x, seed=3)

        sd = export_reference_encoder(variables)
        ref_model = ref_mm.ModelMaskHeadBackbone(
            "dwi", to_reference_dict(cfg), backbone=None)
        ref_model.load_state_dict(_to_torch_sd(sd), strict=True)
        ref_model.eval()

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))
        assert_close(logits, t_logits, "logits")
        assert_close(mask_pred, t_mask, "mask_pred")
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i], f"f{i+1}")

        # export -> import is the identity on every mapped tensor
        back = import_reference_encoder(sd, variables)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)),
            dict(variables), back,
        )

    def test_backboned_encoder_export(self, ref_mm):
        """ResNet50-backboned export: the shared backbone must appear under
        both dynamo-wrapped paths for the genuine module's strict load."""
        from tests.test_importers import TimmResNet50

        cfg = default_parameters()
        mc = dataclasses.replace(
            resolve_backbone_config(cfg.dwi_model), input_size=64)
        cfg = cfg.replace(dwi_model=mc)
        C = cfg.dwi_channel_num

        class FeatureInfo:
            def channels(self):
                return [256, 512, 1024, 2048]

            def reduction(self):
                return [4, 8, 8, 8]

        class FakeTimm(TimmResNet50):
            feature_info = FeatureInfo()

        from dmf_tpu.models.backbones import resnet50_features

        x = np.random.RandomState(1).rand(1, 64, 64, C).astype(np.float32)
        model, variables = _init_encoder(cfg, x,
                                         backbone=resnet50_features(C), seed=5)
        sd = export_reference_encoder(variables)
        ref_model = ref_mm.ModelMaskHeadBackbone(
            "dwi", to_reference_dict(cfg), backbone=FakeTimm(in_ch=C))
        ref_model.load_state_dict(_to_torch_sd(sd), strict=True)
        ref_model.eval()

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))
        assert_close(logits, t_logits, "logits", rtol=5e-4)
        assert_close(mask_pred, t_mask, "mask_pred", rtol=5e-4)
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i],
                         f"f{i+1}", rtol=5e-4)

    def test_vit_backboned_encoder_export(self, ref_mm):
        """ViT/DINO-backboned export (token backbone, no BN stats)."""
        from tests.test_importers import TimmViT

        cfg = default_parameters()
        mc = dataclasses.replace(
            resolve_backbone_config(dataclasses.replace(
                cfg.dwi_model, backbone_str="vit_base_patch16_224")),
            input_size=128, channels=(16, 16, 32),
        )
        cfg = cfg.replace(dwi_model=mc)
        C = cfg.dwi_channel_num

        class FeatureInfo:
            def channels(self):
                return [768] * 12

            def reduction(self):
                return [16] * 12

        class FakeTimmViT(TimmViT):
            feature_info = FeatureInfo()

        from dmf_tpu.models.backbones import vit_base_patch16

        x = np.random.RandomState(6).rand(1, 128, 128, C).astype(np.float32)
        model, variables = _init_encoder(
            cfg, x, backbone=vit_base_patch16(C, img_size=128), seed=9)
        sd = export_reference_encoder(variables)
        ref_model = ref_mm.ModelMaskHeadBackbone(
            "dwi", to_reference_dict(cfg),
            backbone=FakeTimmViT(in_ch=C, img=128, depth=12))
        ref_model.load_state_dict(_to_torch_sd(sd), strict=True)
        ref_model.eval()

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))
        assert_close(logits, t_logits, "vit logits", rtol=5e-4)
        assert_close(mask_pred, t_mask, "vit mask_pred", rtol=5e-4)

    def test_hybrid_transformer_encoder_export(self, ref_mm):
        cfg = tiny_cfg()
        mc = dataclasses.replace(
            cfg.dwi_model, use_hybrid_transformer=True,
            transformer_embed_dim=16, transformer_depth=2,
            transformer_heads=4, transformer_patch_size=2,
        )
        cfg = cfg.replace(dwi_model=mc)
        B, S, C = 2, 32, cfg.dwi_channel_num
        x = np.random.RandomState(4).rand(B, S, S, C).astype(np.float32)
        model, variables = _init_encoder(cfg, x, seed=13)

        sd = export_reference_encoder(variables)
        ref_model = ref_mm.ModelMaskHeadBackbone(
            "dwi", to_reference_dict(cfg), backbone=None)
        ref_model.load_state_dict(_to_torch_sd(sd), strict=True)
        ref_model.eval()

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))
        assert_close(logits, t_logits, "hybrid logits")
        assert_close(mask_pred, t_mask, "hybrid mask")


class TestFusionExport:
    def test_fusion_export(self, ref_mm):
        cfg = tiny_cfg()
        B = 2
        rng = np.random.RandomState(2)
        f3_dwi = rng.rand(B, 16, 16, 32).astype(np.float32)
        f3_dce = rng.rand(B, 16, 16, 32).astype(np.float32)
        dwi_mask = rng.rand(B, 32, 32, 1).astype(np.float32)
        dce_mask = rng.rand(B, 32, 32, 1).astype(np.float32)

        fusion = FusionModel(config=cfg.fusion_model,
                             num_classes=cfg.class_num)
        template = fusion.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            [None, None, jnp.asarray(f3_dwi)], [None, None, jnp.asarray(f3_dce)],
            jnp.asarray(dwi_mask), jnp.asarray(dce_mask), train=False,
        )
        variables = _randomize_variables(template, seed=7)

        sd = export_reference_fusion(variables)
        ref_model = ref_mm.FusionModel(to_reference_dict(cfg))
        ref_model.load_state_dict(_to_torch_sd(sd), strict=True)
        ref_model.eval()

        logits, fused_mask, aux = fusion.apply(
            variables, [None, None, jnp.asarray(f3_dwi)],
            [None, None, jnp.asarray(f3_dce)],
            jnp.asarray(dwi_mask), jnp.asarray(dce_mask), train=False,
        )
        with torch.no_grad():
            t_logits, t_mask, t_aux = ref_model(
                [None, None, t_in(f3_dwi)], [None, None, t_in(f3_dce)],
                t_in(dwi_mask), t_in(dce_mask),
            )
        assert_close(logits, t_logits, "fusion logits")
        assert_close(fused_mask, t_mask, "fused mask")
        assert_close(aux["gating_weights"], t_aux["gating_weights"], "gating")

        # lossless round trip
        back = import_reference_fusion(sd, variables)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)),
            variables["batch_stats"], back["batch_stats"],
        )


class TestCLIExport:
    def test_cli_export_single(self, ref_mm, tmp_path):
        """``dmf_tpu export-ckpt --method dwi`` on a saved training state
        writes a Lightning ckpt the genuine reference encoder strict-loads."""
        from dmf_tpu import cli
        from dmf_tpu.pipeline.prepare_single import build_single_model
        from dmf_tpu.train import TrainState
        from dmf_tpu.utils.checkpoint import save_pytree

        cfg = tiny_cfg()
        cfg_path = str(tmp_path / "cfg.json")
        cfg.save(cfg_path)

        _, variables, _ = build_single_model(cfg, "dwi")
        state = TrainState.create(
            _randomize_variables(jax.device_get(variables), seed=21))
        ckpt = str(tmp_path / "state")
        save_pytree(ckpt, state)

        out = str(tmp_path / "export.ckpt")
        rc = cli.main(["export-ckpt", "--config", cfg_path, "--method", "dwi",
                       "--checkpoint", ckpt, "--out", out])
        assert rc == 0

        sd = load_lightning_ckpt(out)  # torch tensors, model. prefix stripped
        ref_model = ref_mm.ModelMaskHeadBackbone(
            "dwi", to_reference_dict(cfg), backbone=None)
        ref_model.load_state_dict(sd, strict=True)
        want = np.asarray(
            state.params["classification_head"]["Dense_0"]["kernel"]).T
        np.testing.assert_allclose(
            ref_model.classification_head.fc.weight.detach().numpy(), want,
            rtol=1e-6)


class TestLightningFormat:
    def test_save_lightning_ckpt_roundtrip(self, tmp_path):
        sd = {"a.weight": np.ones((2, 3), np.float32),
              "b.num_batches_tracked": np.asarray(0, np.int64)}
        path = str(tmp_path / "export.ckpt")
        save_lightning_ckpt(path, sd)
        loaded = load_lightning_ckpt(path)  # strips the model. prefix back
        assert set(loaded) == set(sd)
        np.testing.assert_array_equal(np.asarray(loaded["a.weight"]),
                                      sd["a.weight"])

    def test_exported_ckpt_resumes_into_dmf(self, ref_mm, tmp_path):
        """An exported Lightning ckpt feeds straight back through our own
        resume path (load_checkpoint's .ckpt dispatch) — both migration
        directions share one on-disk format."""
        from dmf_tpu.train import TrainState
        from dmf_tpu.utils.checkpoint import load_checkpoint

        cfg = tiny_cfg()
        C = cfg.dwi_channel_num
        x = np.zeros((1, 32, 32, C), np.float32)
        model, variables = _init_encoder(cfg, x, seed=11)
        path = str(tmp_path / "export.ckpt")
        save_lightning_ckpt(path, export_reference_encoder(variables))

        state = TrainState.create(
            jax.tree.map(jnp.asarray, variables))
        restored = load_checkpoint(path, jax.device_get(state))
        np.testing.assert_allclose(
            np.asarray(restored.params["classification_head"]["Dense_0"]
                       ["kernel"]),
            np.asarray(variables["params"]["classification_head"]["Dense_0"]
                       ["kernel"]), rtol=1e-6)

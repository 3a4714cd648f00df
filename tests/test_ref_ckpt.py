"""Migration-importer tests against the GENUINE reference modules.

Unlike the hand-built oracles in test_fullmodel_parity.py (which pin OUR
semantics), these import the actual reference source from /root/reference
(read-only mount), build its ``ModelMaskHeadBackbone``/``FusionModel`` with
random weights, export the real state_dicts, run them through
``dmf_tpu.models.ref_ckpt``, and assert the Flax forwards reproduce the
torch forwards — the exact path a reference user takes to migrate a trained
Lightning checkpoint.  Skipped when the reference tree isn't mounted.
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

from dmf_tpu.config import (
    default_parameters,
    resolve_backbone_config,
    to_reference_dict,
)
from dmf_tpu.models import Encoder, FusionModel
from dmf_tpu.models.ref_ckpt import (
    import_reference_encoder,
    import_reference_fusion,
    strip_lightning_prefix,
)

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_mm():
    """Import the reference model_module (stub torchvision for loss.py)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model_module

    return model_module


# shared torch-oracle helpers (same randomizer/NHWC converter as the
# importer tests — keep ONE definition so tolerances can't drift)
from tests.test_importers import _randomize, t_in  # noqa: E402


def assert_close(ours, ref_t, name, rtol=2e-4, atol=2e-5):
    ours = np.asarray(ours)
    ref = ref_t.detach().numpy()
    if ref.ndim == 4:
        ref = ref.transpose(0, 2, 3, 1)
    err = np.abs(ours - ref).max()
    rel = err / (np.abs(ref).max() + 1e-8)
    assert rel < rtol or err < atol, (name, rel, err)


def tiny_cfg():
    cfg = default_parameters()
    mc = dataclasses.replace(
        cfg.dwi_model, channels=(8, 16, 32), input_size=32,
        use_backbone=False, proj_dim=4, dropout=0.0, use_se=True,
        enable_modality_attention=True,
    )
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=32, dce_out_channels=32,
    )
    fmc = dataclasses.replace(mc, fusion_specific=fs)
    return cfg.replace(dwi_model=mc, dce_model=mc, fusion_model=fmc)


class TestEncoderImport:
    def test_custom_encoder_roundtrip(self, ref_mm):
        cfg = tiny_cfg()
        refd = to_reference_dict(cfg)
        ref_model = ref_mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        _randomize(ref_model, seed=3)
        ref_model.eval()

        B, S, C = 2, 32, cfg.dwi_channel_num
        rng = np.random.RandomState(0)
        x = rng.rand(B, S, S, C).astype(np.float32)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))

        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num)
        template = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), train=False,
        )
        # the Lightning wrapper prefix must be tolerated
        sd = {"model." + k: v for k, v in ref_model.state_dict().items()}
        variables = import_reference_encoder(sd, template)
        variables = jax.tree.map(jnp.asarray, variables)

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        assert_close(logits, t_logits, "logits")
        assert_close(mask_pred, t_mask, "mask_pred")
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i], f"f{i+1}")
        for i in range(2):
            assert_close(aux["recon_feats"][i], t_aux["recon_feats"][i],
                         f"r{i+1}")
        for i in range(4):
            assert_close(aux["proj_pairs"][i], t_aux["proj_pairs"][i],
                         f"proj{i}")

    def test_hybrid_transformer_encoder_roundtrip(self, ref_mm):
        """use_hybrid_transformer=True: block3 replaced by the hybrid
        TransformerStage (packed qkv, LayerScale) + trans_out_proj."""
        cfg = tiny_cfg()
        mc = dataclasses.replace(
            cfg.dwi_model, use_hybrid_transformer=True,
            transformer_embed_dim=16, transformer_depth=2,
            transformer_heads=4, transformer_patch_size=2,
        )
        cfg = cfg.replace(dwi_model=mc)
        refd = to_reference_dict(cfg)
        ref_model = ref_mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        _randomize(ref_model, seed=13)
        ref_model.eval()

        B, S, C = 2, 32, cfg.dwi_channel_num
        rng = np.random.RandomState(4)
        x = rng.rand(B, S, S, C).astype(np.float32)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))

        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num)
        template = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), train=False,
        )
        variables = import_reference_encoder(ref_model.state_dict(), template)
        variables = jax.tree.map(jnp.asarray, variables)
        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        assert_close(logits, t_logits, "hybrid logits")
        assert_close(mask_pred, t_mask, "hybrid mask")
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i], f"f{i+1}")

    def test_backboned_encoder_roundtrip(self, ref_mm):
        """Full path: fake-timm ResNet50 backbone + adapter necks + blend
        scalars/norms, against the reference's own BackboneAdapter."""
        from tests.test_importers import TimmResNet50

        cfg = default_parameters()
        mc = dataclasses.replace(
            resolve_backbone_config(cfg.dwi_model), input_size=64,
        )
        cfg = cfg.replace(dwi_model=mc)
        C = cfg.dwi_channel_num

        class FeatureInfo:
            def channels(self):
                return [256, 512, 1024, 2048]

            def reduction(self):
                return [4, 8, 8, 8]

        class FakeTimm(TimmResNet50):
            feature_info = FeatureInfo()

        backbone = FakeTimm(in_ch=C)
        refd = to_reference_dict(cfg)
        ref_model = ref_mm.ModelMaskHeadBackbone("dwi", refd,
                                                 backbone=backbone)
        _randomize(ref_model, seed=5)
        ref_model.eval()

        B, S = 1, 64
        rng = np.random.RandomState(1)
        x = rng.rand(B, S, S, C).astype(np.float32)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))

        from dmf_tpu.models.backbones import resnet50_features

        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num,
                        backbone=resnet50_features(C))
        template = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), train=False,
        )
        variables = import_reference_encoder(ref_model.state_dict(), template)
        variables = jax.tree.map(jnp.asarray, variables)

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        assert_close(logits, t_logits, "logits", rtol=5e-4)
        assert_close(mask_pred, t_mask, "mask_pred", rtol=5e-4)
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i],
                         f"f{i+1}", rtol=5e-4)


    def test_vit_backboned_encoder_roundtrip(self, ref_mm):
        """ViT/DINO-backboned migration: fake-timm ViT-B token backbone +
        token-reshape adapter (model_module.py:457-467), chains
        [0-2]/[3-6]/[7-11] (foundation_model.py:527-531), against the
        reference's own BackboneAdapter."""
        from tests.test_importers import TimmViT

        cfg = default_parameters()
        mc = dataclasses.replace(
            resolve_backbone_config(dataclasses.replace(
                cfg.dwi_model, backbone_str="vit_base_patch16_224")),
            input_size=128,
            # post-resolve shrink: necks/blocks at (768,768,768) add nothing
            # to migration coverage — the ViT itself stays genuine B/16
            channels=(16, 16, 32),
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

        backbone = FakeTimmViT(in_ch=C, img=128, depth=12)
        refd = to_reference_dict(cfg)
        ref_model = ref_mm.ModelMaskHeadBackbone("dwi", refd,
                                                 backbone=backbone)
        _randomize(ref_model, seed=9)
        ref_model.eval()

        B, S = 1, 128
        rng = np.random.RandomState(6)
        x = rng.rand(B, S, S, C).astype(np.float32)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))

        from dmf_tpu.models.backbones import vit_base_patch16

        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num,
                        backbone=vit_base_patch16(C, img_size=128))
        template = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), train=False,
        )
        variables = import_reference_encoder(ref_model.state_dict(), template)
        variables = jax.tree.map(jnp.asarray, variables)

        logits, aux, mask_pred = model.apply(variables, jnp.asarray(x),
                                             train=False)
        assert_close(logits, t_logits, "vit logits", rtol=5e-4)
        assert_close(mask_pred, t_mask, "vit mask_pred", rtol=5e-4)
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i],
                         f"f{i+1}", rtol=5e-4)


class TestFusionImport:
    def test_fusion_roundtrip(self, ref_mm):
        cfg = tiny_cfg()
        refd = to_reference_dict(cfg)
        ref_model = ref_mm.FusionModel(refd)
        _randomize(ref_model, seed=7)
        ref_model.eval()

        B = 2
        rng = np.random.RandomState(2)
        f3_dwi = rng.rand(B, 16, 16, 32).astype(np.float32)
        f3_dce = rng.rand(B, 16, 16, 32).astype(np.float32)
        dwi_mask = rng.rand(B, 32, 32, 1).astype(np.float32)
        dce_mask = rng.rand(B, 32, 32, 1).astype(np.float32)
        with torch.no_grad():
            t_logits, t_mask, t_aux = ref_model(
                [None, None, t_in(f3_dwi)], [None, None, t_in(f3_dce)],
                t_in(dwi_mask), t_in(dce_mask),
            )

        fusion = FusionModel(config=cfg.fusion_model,
                             num_classes=cfg.class_num)
        template = fusion.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            [None, None, jnp.asarray(f3_dwi)],
            [None, None, jnp.asarray(f3_dce)],
            jnp.asarray(dwi_mask), jnp.asarray(dce_mask), train=False,
        )
        variables = import_reference_fusion(ref_model.state_dict(), template)
        variables = jax.tree.map(jnp.asarray, variables)

        logits, fused_mask, aux = fusion.apply(
            variables, [None, None, jnp.asarray(f3_dwi)],
            [None, None, jnp.asarray(f3_dce)],
            jnp.asarray(dwi_mask), jnp.asarray(dce_mask), train=False,
        )
        assert_close(logits, t_logits, "fusion logits")
        assert_close(fused_mask, t_mask, "fused mask")
        assert_close(aux["gating_weights"], t_aux["gating_weights"], "gating")
        assert_close(aux["proj_fused"], t_aux["proj_fused"], "projF")
        assert_close(aux["recon_fused"], t_aux["recon_fused"], "recon")
        np.testing.assert_allclose(
            np.asarray(aux["attn_weights"]),
            t_aux["attn_weights"].numpy(), rtol=1e-3, atol=1e-5,
        )


class TestHelpers:
    def test_strip_prefix(self):
        sd = {"model.a.weight": 1, "b.bias": 2}
        out = strip_lightning_prefix(sd)
        assert set(out) == {"a.weight", "b.bias"}

    def test_load_checkpoint_accepts_lightning_ckpt(self, ref_mm, tmp_path):
        """The resume path (CLI --pretrained-dwi) takes a reference .ckpt
        directly: weights are imported, optimizer state stays fresh."""
        from dmf_tpu.train import TrainState
        from dmf_tpu.utils.checkpoint import load_checkpoint

        cfg = tiny_cfg()
        refd = to_reference_dict(cfg)
        ref_model = ref_mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        _randomize(ref_model, seed=11)
        path = str(tmp_path / "best.ckpt")
        torch.save({"state_dict": {"model." + k: v for k, v in
                                   ref_model.state_dict().items()}}, path)

        C = cfg.dwi_channel_num
        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 32, C)), train=False,
        )
        state = TrainState.create(variables)
        restored = load_checkpoint(path, jax.device_get(state))
        want = ref_model.classification_head.fc.weight.detach().numpy().T
        np.testing.assert_allclose(
            np.asarray(restored.params["classification_head"]["Dense_0"]
                       ["kernel"]), want, rtol=1e-6)
        assert int(restored.step) == 0  # fresh optimizer/step

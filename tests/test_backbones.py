"""Backbone tests: feature pyramid shapes, checkpoint import fidelity,
encoder integration with the alpha-blend path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.config import default_parameters, resolve_backbone_config
from dmf_tpu.models import Encoder
from dmf_tpu.models.backbones import (
    ResNetFeatures,
    ViTFeatures,
    adapt_first_conv,
    advanced_adapt_first_conv,
    import_resnet50,
    map_rasool_to_timm_keys,
    resize_pos_embed,
)


class TestResNetShapes:
    @pytest.mark.parametrize("deep", [False, True])
    def test_feature_pyramid_output_stride8(self, deep):
        m = ResNetFeatures(in_channels=6, deep_stem=deep, avg_down=deep)
        x = jnp.zeros((1, 64, 64, 6))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        feats = m.apply(variables, x, train=False)
        assert [f.shape for f in feats] == [
            (1, 16, 16, 256),  # C2 stride 4
            (1, 8, 8, 512),  # C3 stride 8
            (1, 8, 8, 1024),  # C4 dilated, stride 8
            (1, 8, 8, 2048),  # C5 dilated, stride 8
        ]


class TestViTShapes:
    def test_block_outputs(self):
        m = ViTFeatures(in_channels=6, img_size=32, depth=2,
                        out_indices=(0, 1), embed_dim=64, num_heads=4)
        x = jnp.zeros((2, 32, 32, 6))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        feats = m.apply(variables, x, train=False)
        assert len(feats) == 2
        # (B, N=(32/16)^2=4 tokens, C=64), cls stripped
        assert feats[0].shape == (2, 4, 64)
        assert feats[1].shape == (2, 4, 64)


class TestConvAdaptation:
    def test_mean_replicate(self, rng):
        w = rng.randn(8, 3, 7, 7).astype(np.float32)
        out = adapt_first_conv(w, 14)
        assert out.shape == (8, 14, 7, 7)
        assert np.allclose(out[:, 0], w.mean(axis=1))
        assert np.allclose(out[:, 5], out[:, 0])

    def test_advanced_bt601(self, rng):
        w = rng.randn(8, 3, 7, 7).astype(np.float32)
        out = advanced_adapt_first_conv(w, 4, eps=0.05)
        lum = 0.2989 * w[:, 0] + 0.5870 * w[:, 1] + 0.1140 * w[:, 2]
        scales = np.linspace(0.95, 1.05, 4)
        for c in range(4):
            assert np.allclose(out[:, c], lum * scales[c], atol=1e-6)

    def test_noop_when_channels_match(self, rng):
        w = rng.randn(8, 3, 3, 3).astype(np.float32)
        assert adapt_first_conv(w, 3) is w


class TestRasoolRemap:
    def test_key_mapping(self):
        sd = {
            "backbone.0.weight": np.zeros((64, 3, 7, 7)),
            "backbone.1.weight": np.zeros(64),
            "backbone.1.running_mean": np.zeros(64),
            "backbone.4.0.conv1.weight": np.zeros((64, 64, 1, 1)),
            "backbone.7.2.bn3.bias": np.zeros(2048),
            "backbone.fc.weight": np.zeros((1000, 2048)),
        }
        out = map_rasool_to_timm_keys(sd)
        assert "conv1.weight" in out
        assert "bn1.weight" in out and "bn1.running_mean" in out
        assert "layer1.0.conv1.weight" in out
        assert "layer4.2.bn3.bias" in out
        assert not any(k.startswith("fc.") for k in out)


class TestResNetImport:
    def test_roundtrip_into_flax(self, rng):
        # build a synthetic timm-layout state dict with correct shapes by
        # initializing our model and inverting the mapping
        m = ResNetFeatures(in_channels=5)
        x = jnp.zeros((1, 32, 32, 5))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)

        sd = {}
        rngs = np.random.RandomState(0)

        def conv_key(shape):  # HWIO -> OIHW
            return rngs.randn(shape[3], shape[2], shape[0], shape[1]).astype(
                np.float32
            )

        sd["conv1.weight"] = rngs.randn(64, 3, 7, 7).astype(np.float32)
        for part in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{part}"] = rngs.rand(64).astype(np.float32)
        layers = (3, 4, 6, 3)
        planes = (64, 128, 256, 512)
        in_ch = 64
        for s in range(4):
            for b in range(layers[s]):
                p = planes[s]
                pre = f"layer{s + 1}.{b}"
                sd[f"{pre}.conv1.weight"] = rngs.randn(p, in_ch, 1, 1).astype(np.float32)
                sd[f"{pre}.conv2.weight"] = rngs.randn(p, p, 3, 3).astype(np.float32)
                sd[f"{pre}.conv3.weight"] = rngs.randn(4 * p, p, 1, 1).astype(np.float32)
                for ci, ch in zip((1, 2, 3), (p, p, 4 * p)):
                    for part in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pre}.bn{ci}.{part}"] = rngs.rand(ch).astype(np.float32)
                if b == 0:
                    sd[f"{pre}.downsample.0.weight"] = rngs.randn(
                        4 * p, in_ch, 1, 1
                    ).astype(np.float32)
                    for part in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pre}.downsample.1.{part}"] = rngs.rand(4 * p).astype(
                            np.float32
                        )
                    in_ch = 4 * p
        params, stats = import_resnet50(sd, in_channels=5,
                                        use_advanced_adapt=False)

        # every imported leaf must match the flax tree's shape
        flat_ref = jax.tree_util.tree_leaves_with_path(variables["params"])
        flat_imp = jax.tree_util.tree_leaves_with_path(params)
        ref_shapes = {jax.tree_util.keystr(p): v.shape for p, v in flat_ref}
        for p, v in flat_imp:
            k = jax.tree_util.keystr(p)
            assert k in ref_shapes, f"unexpected imported key {k}"
            assert tuple(v.shape) == tuple(ref_shapes[k]), (
                k, v.shape, ref_shapes[k]
            )
        assert len(flat_imp) == len(flat_ref)

        # imported conv1 channel 0 equals the mean of the torch RGB filter
        want = sd["conv1.weight"].mean(axis=1).transpose(1, 2, 0)  # HWO
        got = np.asarray(params["conv1"]["kernel"])[:, :, 0, :]
        assert np.allclose(got, want, atol=1e-6)

        # model runs with imported weights
        new_vars = {"params": params, "batch_stats": stats}
        feats = m.apply(new_vars, x, train=False)
        assert feats[0].shape == (1, 8, 8, 256)


class TestPosEmbedResize:
    def test_resize_grid(self):
        pos = np.random.RandomState(0).randn(1, 1 + 14 * 14, 8).astype(np.float32)
        out = resize_pos_embed(pos, 16)
        assert out.shape == (1, 1 + 16 * 16, 8)
        assert np.allclose(out[:, 0], pos[:, 0])  # cls preserved

    def test_noop_same_grid(self):
        pos = np.zeros((1, 1 + 16 * 16, 8), np.float32)
        assert resize_pos_embed(pos, 16) is pos


class TestEncoderWithBackbone:
    def test_resnet_backbone_encoder_forward(self):
        cfg = default_parameters()
        mc = dataclasses.replace(
            cfg.dwi_model, channels=(16, 32, 64), input_size=64,
            proj_dim=8, backbone_str="radimagenet",
        )
        mc = resolve_backbone_config(mc)
        backbone = ResNetFeatures(in_channels=5)
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4,
                      backbone=backbone)
        x = jnp.zeros((2, 64, 64, 5))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        logits, aux, mask_pred = enc.apply(variables, x, train=False)
        assert logits.shape == (2, 4)
        # with backbone: f1 = adapter(C2 @ stride4 = 16x16) -> block1
        # downsample -> 8x8; f2/f3 stay 8x8
        f1, f2, f3 = aux["raw_feats"]
        assert f1.shape == (2, 8, 8, 16)
        assert f2.shape == (2, 8, 8, 32)
        assert f3.shape == (2, 8, 8, 64)
        assert mask_pred.shape == (2, 32, 32, 1)
        # the backbone's params are adopted at the encoder top level under
        # 'backbone' — the name-based grouping (selector_helpers.py:163
        # semantics) keys off that substring
        assert "backbone" in variables["params"]
        from dmf_tpu.train import build_group_spec

        spec = build_group_spec(variables["params"], use_backbone=True)
        assert all(
            g == 0 for g in jax.tree.leaves(spec.group_ids["backbone"])
        )
        assert all(
            g == 0 for g in jax.tree.leaves(spec.group_ids["backbone_adapter"])
        )

    def test_vit_backbone_encoder_forward(self):
        """ViT/DINO path: 12 token outputs chained [0-2]/[3-6]/[7-11]
        (foundation_model.py:527-536), tokens reshaped to maps by the
        adapter (model_module.py:457-467)."""
        cfg = default_parameters()
        mc = dataclasses.replace(
            cfg.dwi_model, input_size=64, proj_dim=8,
            backbone_str="dino_vitbase16_pretrain",
        )
        mc = resolve_backbone_config(mc)
        assert mc.transformer_backbone
        assert mc.backbone_index_lists == ((0, 1, 2), (3, 4, 5, 6),
                                           (7, 8, 9, 10, 11))
        backbone = ViTFeatures(in_channels=5, img_size=64, embed_dim=48,
                               depth=12, num_heads=4)
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4,
                      backbone=backbone)
        x = jnp.zeros((2, 64, 64, 5))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        logits, aux, mask_pred = enc.apply(variables, x, train=False)
        assert logits.shape == (2, 4)
        f1, f2, f3 = aux["raw_feats"]
        # ViT tokens come back at stride 16 (4x4 maps for 64^2), and the
        # vit config disables block downsampling (downsample=(F,F,F))
        assert f1.shape[1:3] == f2.shape[1:3] == f3.shape[1:3] == (4, 4)
        assert mask_pred.shape == (2, 32, 32, 1)

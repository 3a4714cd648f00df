"""Model shape/behavior tests under jit (no backbone; backbone tests live in
test_backbones.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.config import default_parameters
from dmf_tpu.models import Encoder, FusionModel, ResLiteBlock, TransformerStage


def small_model_cfg(**over):
    cfg = default_parameters()
    mc = dataclasses.replace(
        cfg.dwi_model,
        channels=(16, 32, 64),
        input_size=32,
        use_backbone=False,
        transformer_embed_dim=32,
        transformer_depth=1,
        transformer_heads=2,
        **over,
    )
    return mc


def init_and_apply(module, *args, train=False, mc=False, rngs=None):
    key = jax.random.PRNGKey(0)
    rngs = rngs or {"params": key, "dropout": jax.random.PRNGKey(1)}
    variables = module.init(rngs, *args, train=train, mc=mc)
    out, mutated = module.apply(
        variables, *args, train=train, mc=mc,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"] if train else [],
    )
    return out, variables


class TestResLiteBlock:
    def test_shapes_and_recon(self):
        blk = ResLiteBlock(in_ch=4, out_ch=8, downsample=True, recon_ch=1,
                           use_se=True)
        x = jnp.ones((2, 16, 16, 4))
        (out, recon), _ = init_and_apply(blk, x, train=True)
        assert out.shape == (2, 8, 8, 8)
        assert recon.shape == (2, 8, 8, 1)

    def test_no_recon(self):
        blk = ResLiteBlock(in_ch=4, out_ch=4, recon_ch=0)
        x = jnp.ones((2, 8, 8, 4))
        (out, recon), _ = init_and_apply(blk, x)
        assert recon is None
        assert out.shape == x.shape


class TestEncoder:
    @pytest.mark.parametrize("mask_stage", ["f1", "f2", "f3"])
    def test_forward_shapes(self, mask_stage):
        mc = small_model_cfg()
        mc = dataclasses.replace(
            mc, mask=dataclasses.replace(mc.mask, mask_stage=mask_stage)
        )
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4)
        x = jnp.ones((2, 32, 32, 5))
        (logits, aux, mask_pred), _ = init_and_apply(enc, x)
        assert logits.shape == (2, 4)
        assert mask_pred.shape == (2, 32, 32, 1)
        f1, f2, f3 = aux["raw_feats"]
        assert f1.shape == (2, 16, 16, 16)  # downsample at block1
        assert f2.shape == (2, 16, 16, 32)
        assert f3.shape == (2, 16, 16, 64)
        r1, r2 = aux["recon_feats"]
        assert r1.shape[-1] == 1 and r2.shape[-1] == 1
        p1, p1_r, p2, p2_r = aux["proj_pairs"]
        assert p1.shape == (2, 64, 64, 64)  # pooled to (proj_dim, proj_dim)
        assert aux["mod_attn_map"].shape == (2, 1, 1, 5)

    def test_input_cast_to_compute_dtype(self):
        """The encoder casts the raw f32 volume to its compute dtype at the
        boundary, so the modality-SE multiply does not promote the full-res
        input back to f32 (r4 train-profile finding; e2e-neutral but halves
        the prologue HBM traffic — see the comment in models/encoder.py)."""
        mc = small_model_cfg()
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4,
                      dtype=jnp.bfloat16)
        x = jnp.ones((2, 32, 32, 5), jnp.float32)
        (logits, aux, _), variables = init_and_apply(enc, x)
        # the SE-scaled input (fed to the first conv) must be bf16, not a
        # promoted f32 — pin it via the prefix_only split, which returns
        # exactly the post-modality-SE tensor
        x_in, _, _ = enc.apply(variables, x, prefix_only=True)
        assert x_in.dtype == jnp.bfloat16
        # fp32 configs are untouched by the boundary cast
        enc32 = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4)
        (_, _, _), v32 = init_and_apply(enc32, x)
        x_in32, _, _ = enc32.apply(v32, x, prefix_only=True)
        assert x_in32.dtype == jnp.float32

    def test_hybrid_transformer(self):
        mc = small_model_cfg(use_hybrid_transformer=True)
        enc = Encoder(method="dce", config=mc, channel_num=6, num_classes=4)
        x = jnp.ones((2, 32, 32, 6))
        (logits, aux, mask_pred), _ = init_and_apply(enc, x)
        assert logits.shape == (2, 4)
        # transformer patchify (patch 2) halves the f2 map
        assert aux["raw_feats"][2].shape == (2, 8, 8, 64)

    def test_mc_dropout_stochastic_bn_frozen(self):
        mc = small_model_cfg()
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4)
        x = jnp.ones((2, 32, 32, 5))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )

        def fwd(rng):
            logits, _, _ = enc.apply(
                variables, x, train=False, mc=True, rngs={"dropout": rng}
            )
            return logits

        a = fwd(jax.random.PRNGKey(10))
        b = fwd(jax.random.PRNGKey(11))
        assert not np.allclose(np.asarray(a), np.asarray(b)), (
            "MC dropout must produce stochastic outputs"
        )
        # eval mode (no mc) must be deterministic
        c1, _, _ = enc.apply(variables, x, train=False)
        c2, _, _ = enc.apply(variables, x, train=False)
        assert np.allclose(np.asarray(c1), np.asarray(c2))

    def test_jit_compiles(self):
        mc = small_model_cfg()
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4)
        x = jnp.ones((2, 32, 32, 5))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        fwd = jax.jit(lambda v, x: enc.apply(v, x, train=False)[0])
        logits = fwd(variables, x)
        assert logits.shape == (2, 4)


class TestFusionModel:
    def test_forward(self):
        cfg = default_parameters()
        fmc = dataclasses.replace(
            small_model_cfg(),
            fusion_specific=dataclasses.replace(
                cfg.fusion_model.fusion_specific,
                fusion_channels=32,
                dwi_out_channels=64,
                dce_out_channels=64,
            ),
        )
        fusion = FusionModel(config=fmc, num_classes=4)
        f3 = jnp.ones((2, 16, 16, 64))
        feats = [jnp.ones((2, 16, 16, 16)), jnp.ones((2, 16, 16, 32)), f3]
        masks = jnp.ones((2, 32, 32, 1))
        (logits, fused_mask, aux), _ = init_and_apply(
            fusion, feats, feats, masks, masks
        )
        assert logits.shape == (2, 4)
        assert fused_mask.shape == (2, 32, 32, 1)
        assert aux["gating_weights"].shape == (2, 2)
        assert np.allclose(np.asarray(aux["gating_weights"]).sum(axis=1), 1.0,
                           atol=1e-5)
        assert aux["attn_weights"].shape == (2, 16, 16)  # (B, Nq, Nk) head-avg
        assert aux["recon_fused"].shape == (2, 16, 16, 1)


class TestTransformerStage:
    def test_roundtrip_shape(self):
        stage = TransformerStage(embed_dim=32, depth=2, heads=4, patch_size=2)
        x = jnp.ones((2, 16, 16, 8))
        out, _ = init_and_apply(stage, x)
        assert out.shape == (2, 8, 8, 32)


class TestRemat:
    def test_remat_matches_no_remat(self):
        import dataclasses

        mc = small_model_cfg()
        mc_r = dataclasses.replace(mc, remat=True)
        enc = Encoder(method="dwi", config=mc, channel_num=5, num_classes=4)
        enc_r = Encoder(method="dwi", config=mc_r, channel_num=5, num_classes=4)
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 5))
        variables = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )

        def loss(module, v, xx):
            logits, _, _ = module.apply(v, xx, train=False)
            return (logits**2).sum()

        # same params work for both (remat does not change the param tree)
        l2, g2 = jax.value_and_grad(
            lambda v: loss(enc_r, {"params": v,
                                   "batch_stats": variables["batch_stats"]},
                           x)
        )(variables["params"])
        l1b, g1b = jax.value_and_grad(
            lambda v: loss(enc, {"params": v,
                                 "batch_stats": variables["batch_stats"]},
                           x)
        )(variables["params"])
        assert abs(float(l1b) - float(l2)) < 1e-4
        for a, b in zip(jax.tree.leaves(g1b), jax.tree.leaves(g2)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestAugmentationStats:
    def test_flips_and_rotations_occur(self):
        from dmf_tpu.data import augment_batch

        imgs = jnp.zeros((16, 16, 16, 1)).at[:, :4, :4, 0].set(1.0)
        out = np.asarray(augment_batch(jax.random.PRNGKey(0), imgs, 16))
        # augmented batch must differ per-sample (not all identical)
        diffs = [
            not np.allclose(out[i], out[j])
            for i in range(4) for j in range(i + 1, 4)
        ]
        assert any(diffs)
        # mass roughly preserved on average (affine moves, zero-fills edges)
        assert 0.1 < out.sum() / imgs.sum() <= 1.5


class TestWeightInit:
    def test_weight_init_distributions(self):
        """Init matches the reference's initialize_model semantics
        (model_module.py:1002-1023): Linear kernels kaiming-uniform
        U(+-sqrt(6/fan_in)), conv kernels torch-default U(+-sqrt(1/fan_in)),
        BatchNorm scale ~ N(1, 0.02), biases zero."""
        from dmf_tpu.models.layers import (
            bn_scale_init,
            conv_kernel_init,
            linear_kernel_init,
        )

        key = jax.random.PRNGKey(0)
        fan_in = 256
        lin = np.asarray(linear_kernel_init(key, (fan_in, 512)))
        bound = np.sqrt(6.0 / fan_in)
        assert lin.min() >= -bound - 1e-6 and lin.max() <= bound + 1e-6
        # uniform over (-b, b) -> std ~ b/sqrt(3)
        assert abs(lin.std() - bound / np.sqrt(3)) < 0.02 * bound

        conv = np.asarray(conv_kernel_init(key, (3, 3, 16, 32)))
        cbound = np.sqrt(1.0 / (3 * 3 * 16))
        assert conv.min() >= -cbound - 1e-6 and conv.max() <= cbound + 1e-6

        scale = np.asarray(bn_scale_init(key, (4096,)))
        assert abs(scale.mean() - 1.0) < 5e-3
        assert abs(scale.std() - 0.02) < 5e-3

    def test_model_biases_zero_at_init(self):
        mc = small_model_cfg()
        enc = Encoder(method="dwi", config=mc, channel_num=14, num_classes=4)
        variables = enc.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 32, 14)), train=False,
        )
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        biases = [
            np.asarray(v) for p, v in flat if "bias" in str(p[-1])
        ]
        assert biases, "expected bias leaves"
        for b in biases:
            assert np.all(b == 0.0)


class TestCaptureFeatures:
    def test_grabs_block_outputs(self):
        """Functional GetWeights equivalent (train.py:926-942): capture a
        named submodule's output from a full forward."""
        from dmf_tpu.utils.introspect import capture_features

        mc = small_model_cfg()
        enc = Encoder(method="dwi", config=mc, channel_num=14, num_classes=4)
        x = jnp.zeros((2, 32, 32, 14))
        v = enc.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        (logits, aux, mask), feats = capture_features(
            enc, v, x, train=False, path_filter="block1")
        assert "block1" in feats
        # the captured block1 output equals the raw_feats aux entry
        blk = feats["block1"]
        blk = blk[0] if isinstance(blk, tuple) else blk
        assert np.allclose(np.asarray(blk), np.asarray(aux["raw_feats"][0]))

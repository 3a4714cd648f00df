"""Activation-level parity: our Flax layers vs torch oracles implementing
the reference modules (model_module.py), with transplanted weights.

This catches conv-padding / BN-semantics / pooling mismatches that shape
tests can't (SURVEY.md §7: checkpoint-import fidelity and BatchNorm
semantics are 'hard parts' for AUC parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

from dmf_tpu.models import (
    ClassificationHead,
    MaskHeadResize,
    ResLiteBlock,
    SEBlock,
)


def t_in(x_nhwc):
    return torch.tensor(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def from_t(y):
    return y.detach().permute(0, 2, 3, 1).numpy()


def conv_w(flax_kernel):
    # HWIO -> OIHW
    return torch.tensor(np.asarray(flax_kernel).transpose(3, 2, 0, 1))


def set_bn(tbn, flax_params, flax_stats):
    tbn.weight.data = torch.tensor(np.asarray(flax_params["scale"]))
    tbn.bias.data = torch.tensor(np.asarray(flax_params["bias"]))
    tbn.running_mean.data = torch.tensor(np.asarray(flax_stats["mean"]))
    tbn.running_var.data = torch.tensor(np.asarray(flax_stats["var"]))


class TestSEBlockParity:
    def test_matches_torch(self, rng):
        se = SEBlock(channels=8, reduction=2)
        x = jnp.asarray(rng.rand(2, 6, 6, 8).astype(np.float32))
        variables = se.init(jax.random.PRNGKey(0), x)
        out, w = se.apply(variables, x)

        # torch oracle (model_module.py:25-47)
        p = variables["params"]
        fc1 = nn.Conv2d(8, 4, 1)
        fc2 = nn.Conv2d(4, 8, 1)
        fc1.weight.data = torch.tensor(
            np.asarray(p["Dense_0"]["kernel"]).T[:, :, None, None]
        )
        fc1.bias.data = torch.tensor(np.asarray(p["Dense_0"]["bias"]))
        fc2.weight.data = torch.tensor(
            np.asarray(p["Dense_1"]["kernel"]).T[:, :, None, None]
        )
        fc2.bias.data = torch.tensor(np.asarray(p["Dense_1"]["bias"]))
        xt = t_in(x)
        wt = torch.sigmoid(fc2(TF.gelu(fc1(TF.adaptive_avg_pool2d(xt, 1)))))
        ref = from_t(xt * wt)
        assert np.allclose(np.asarray(out), ref, atol=1e-5)


class TestClassificationHeadParity:
    def test_l2norm_linear(self, rng):
        head = ClassificationHead(num_classes=4)
        x = jnp.asarray(rng.rand(3, 5, 5, 16).astype(np.float32))
        variables = head.init(jax.random.PRNGKey(0), x)
        ours = head.apply(variables, x)

        # torch oracle (model_module.py:355-369)
        p = variables["params"]["Dense_0"]
        fc = nn.Linear(16, 4)
        fc.weight.data = torch.tensor(np.asarray(p["kernel"]).T)
        fc.bias.data = torch.tensor(np.asarray(p["bias"]))
        xt = t_in(x)
        pooled = TF.adaptive_avg_pool2d(xt, 1).flatten(1)
        ref = fc(TF.normalize(pooled, dim=1)).detach().numpy()
        assert np.allclose(np.asarray(ours), ref, atol=1e-5)


class TestResLiteBlockParity:
    def test_full_block_eval_mode(self, rng):
        blk = ResLiteBlock(in_ch=6, out_ch=8, downsample=True, recon_ch=1,
                           use_se=True, dropout=0.0, mid_squeeze=2)
        x = jnp.asarray(rng.rand(2, 8, 8, 6).astype(np.float32))
        variables = blk.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        (out, recon), = [blk.apply(variables, x, train=False)]

        p = variables["params"]
        s = variables["batch_stats"]

        # torch oracle (model_module.py:220-316), eval mode
        conv1 = nn.Conv2d(6, 4, 1, stride=2, bias=False)
        conv1.weight.data = conv_w(p["Conv_0"]["kernel"])
        bn1 = nn.BatchNorm2d(4).eval()
        # flax creation order: skip BN first -> BatchNorm_0 is the skip BN
        set_bn(bn1, p["BatchNorm_1"]["BatchNorm_0"],
               s["BatchNorm_1"]["BatchNorm_0"])
        conv2 = nn.Conv2d(4, 4, 3, padding=1, bias=False)
        conv2.weight.data = conv_w(p["Conv_1"]["kernel"])
        bn2 = nn.BatchNorm2d(4).eval()
        set_bn(bn2, p["BatchNorm_2"]["BatchNorm_0"],
               s["BatchNorm_2"]["BatchNorm_0"])
        conv3 = nn.Conv2d(4, 8, 1, bias=False)
        conv3.weight.data = conv_w(p["Conv_2"]["kernel"])
        bn3 = nn.BatchNorm2d(8).eval()
        set_bn(bn3, p["BatchNorm_3"]["BatchNorm_0"],
               s["BatchNorm_3"]["BatchNorm_0"])
        skip_conv = nn.Conv2d(6, 8, 1, stride=2, bias=False)
        skip_conv.weight.data = conv_w(p["skip_conv"]["kernel"])
        skip_bn = nn.BatchNorm2d(8).eval()
        set_bn(skip_bn, p["BatchNorm_0"]["BatchNorm_0"],
               s["BatchNorm_0"]["BatchNorm_0"])

        xt = t_in(x)
        identity = skip_bn(skip_conv(xt))
        h = bn1(conv1(xt))
        h = TF.gelu(h)
        h = bn2(conv2(h))
        h = TF.gelu(h)
        h = bn3(conv3(h))
        h = TF.gelu(h + identity)

        # SE
        pse = p["se"]
        fc1 = nn.Conv2d(8, 4, 1)
        fc2 = nn.Conv2d(4, 8, 1)
        fc1.weight.data = torch.tensor(
            np.asarray(pse["Dense_0"]["kernel"]).T[:, :, None, None]
        )
        fc1.bias.data = torch.tensor(np.asarray(pse["Dense_0"]["bias"]))
        fc2.weight.data = torch.tensor(
            np.asarray(pse["Dense_1"]["kernel"]).T[:, :, None, None]
        )
        fc2.bias.data = torch.tensor(np.asarray(pse["Dense_1"]["bias"]))
        wse = torch.sigmoid(fc2(TF.gelu(fc1(TF.adaptive_avg_pool2d(h, 1)))))
        h = h * wse

        # recon head
        pr = p["reconstruct"]
        rc1 = nn.Conv2d(8, 8, 3, padding=1, bias=False)
        rc1.weight.data = conv_w(pr["Conv_0"]["kernel"])
        rbn = nn.BatchNorm2d(8).eval()
        set_bn(rbn, pr["BatchNorm_0"]["BatchNorm_0"],
               s["reconstruct"]["BatchNorm_0"]["BatchNorm_0"])
        rc2 = nn.Conv2d(8, 1, 3, padding=1)
        rc2.weight.data = conv_w(pr["Conv_1"]["kernel"])
        rc2.bias.data = torch.tensor(np.asarray(pr["Conv_1"]["bias"]))
        ref_recon = rc2(TF.gelu(rbn(rc1(h))))

        assert np.allclose(np.asarray(out), from_t(h), atol=2e-5)
        assert np.allclose(np.asarray(recon), from_t(ref_recon), atol=2e-5)


class TestMaskHeadParity:
    def test_strided_chain_128_to_32(self, rng):
        head = MaskHeadResize(mid_ch=8, out_size=32)
        x = jnp.asarray(rng.rand(1, 128, 128, 4).astype(np.float32))
        variables = head.init(jax.random.PRNGKey(0), x)
        ours = head.apply(variables, x)
        p = variables["params"]

        pre = nn.Conv2d(4, 8, 1)
        pre.weight.data = conv_w(p["Conv_0"]["kernel"])
        pre.bias.data = torch.tensor(np.asarray(p["Conv_0"]["bias"]))
        d1 = nn.Conv2d(8, 8, 3, stride=2, padding=1)
        d1.weight.data = conv_w(p["Conv_1"]["kernel"])
        d1.bias.data = torch.tensor(np.asarray(p["Conv_1"]["bias"]))
        d2 = nn.Conv2d(8, 8, 3, stride=2, padding=1)
        d2.weight.data = conv_w(p["Conv_2"]["kernel"])
        d2.bias.data = torch.tensor(np.asarray(p["Conv_2"]["bias"]))
        out_c = nn.Conv2d(8, 1, 1)
        out_c.weight.data = conv_w(p["Conv_3"]["kernel"])
        out_c.bias.data = torch.tensor(np.asarray(p["Conv_3"]["bias"]))

        xt = t_in(x)
        h = pre(xt)
        h = TF.gelu(d1(h))
        h = TF.gelu(d2(h))
        ref = from_t(out_c(h))
        assert ours.shape == (1, 32, 32, 1)
        assert np.allclose(np.asarray(ours), ref, atol=2e-5)


class TestResNetStemParity:
    def test_stem_conv_maxpool_vs_torch(self, rng):
        """7x7 stride-2 pad-3 stem + 3x3 stride-2 pad-1 maxpool — the layers
        most sensitive to padding-convention mismatches for pretrained
        checkpoint import."""
        from dmf_tpu.models.backbones.resnet import ResNetFeatures

        m = ResNetFeatures(in_channels=3, layers=(1, 1, 1, 1))
        x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        p = variables["params"]
        s = variables["batch_stats"]

        conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        conv1.weight.data = conv_w(p["conv1"]["kernel"])
        bn1 = nn.BatchNorm2d(64).eval()
        set_bn(bn1, p["bn1"]["BatchNorm_0"], s["bn1"]["BatchNorm_0"])

        xt = t_in(x)
        ref = TF.max_pool2d(TF.relu(bn1(conv1(xt))), 3, stride=2, padding=1)

        # reproduce just the stem through flax by re-running the submodules
        import flax.linen as fnn

        stem = fnn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False)
        h = stem.apply({"params": p["conv1"]}, x)
        h = fnn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5).apply(
            {"params": p["bn1"]["BatchNorm_0"],
             "batch_stats": s["bn1"]["BatchNorm_0"]}, h)
        h = fnn.relu(h)
        h = fnn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        assert np.allclose(np.asarray(h), from_t(ref), atol=1e-4)


class TestDilatedResNetParity:
    def test_full_resnet_vs_torch_timm_semantics(self, rng):
        """Whole dilated (output_stride=8) ResNet vs a torch oracle built
        with timm's block semantics: stride on the 3x3, and the FIRST block
        of a newly dilated stage runs its 3x3 at the PREVIOUS stage's
        dilation (timm resnet.py make_blocks prev_dilation; checkpoint-import
        fidelity is a SURVEY.md §7 'hard part')."""
        from dmf_tpu.models.backbones.resnet import ResNetFeatures

        m = ResNetFeatures(in_channels=3, layers=(1, 1, 2, 2))
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        # randomize batch stats so BN is non-trivial; keep var well away from
        # 0 so 1/sqrt(var) doesn't amplify magnitudes out of fp32 headroom
        stats = jax.tree.map(
            lambda v: jnp.asarray(
                0.5 + np.random.RandomState(7).rand(*v.shape).astype(np.float32)
            ),
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": stats}
        feats = m.apply(variables, x, train=False)

        p, s = variables["params"], variables["batch_stats"]

        def torch_bn(name, ch):
            bn = nn.BatchNorm2d(ch).eval()
            set_bn(bn, p[name]["BatchNorm_0"], s[name]["BatchNorm_0"])
            return bn

        def bottleneck(xt, pre, planes, in_ch, stride, dilation,
                       first_dilation):
            out_ch = planes * 4
            bp, bs = p[pre], s[pre]
            idn = xt
            if in_ch != out_ch or stride != 1:
                dw = conv_w(bp["downsample_conv"]["kernel"])
                idn = TF.conv2d(xt, dw, stride=stride)
                dbn = nn.BatchNorm2d(out_ch).eval()
                set_bn(dbn, bp["downsample_bn"]["BatchNorm_0"],
                       bs["downsample_bn"]["BatchNorm_0"])
                idn = dbn(idn)
            h = TF.conv2d(xt, conv_w(bp["conv1"]["kernel"]))
            bn1 = nn.BatchNorm2d(planes).eval()
            set_bn(bn1, bp["bn1"]["BatchNorm_0"], bs["bn1"]["BatchNorm_0"])
            h = TF.relu(bn1(h))
            d = first_dilation
            h = TF.conv2d(h, conv_w(bp["conv2"]["kernel"]), stride=stride,
                          padding=d, dilation=d)
            bn2 = nn.BatchNorm2d(planes).eval()
            set_bn(bn2, bp["bn2"]["BatchNorm_0"], bs["bn2"]["BatchNorm_0"])
            h = TF.relu(bn2(h))
            h = TF.conv2d(h, conv_w(bp["conv3"]["kernel"]))
            bn3 = nn.BatchNorm2d(out_ch).eval()
            set_bn(bn3, bp["bn3"]["BatchNorm_0"], bs["bn3"]["BatchNorm_0"])
            return TF.relu(bn3(h) + idn)

        xt = t_in(x)
        xt = TF.conv2d(xt, conv_w(p["conv1"]["kernel"]), stride=2, padding=3)
        xt = TF.relu(torch_bn("bn1", 64)(xt))
        xt = TF.max_pool2d(xt, 3, stride=2, padding=1)

        layers, planes = (1, 1, 2, 2), (64, 128, 256, 512)
        strides = (1, 2, 1, 1)  # os=8: layers 3/4 dilate instead
        dils = (1, 1, 2, 4)
        ref_feats, in_ch = [], 64
        for stage in range(4):
            prev_d = dils[stage - 1] if stage else 1
            for blk in range(layers[stage]):
                xt = bottleneck(
                    xt, f"layer{stage + 1}_block{blk}", planes[stage], in_ch,
                    stride=strides[stage] if blk == 0 else 1,
                    dilation=dils[stage],
                    first_dilation=prev_d if blk == 0 else dils[stage],
                )
                in_ch = planes[stage] * 4
            ref_feats.append(from_t(xt))

        for ours, ref in zip(feats, ref_feats):
            assert ours.shape == ref.shape
            ours = np.asarray(ours)
            # relative tolerance: activations compound over ~7 conv+BN
            # layers, so compare against the feature magnitude
            denom = np.abs(ref).max() + 1e-6
            assert np.abs(ours - ref).max() / denom < 1e-5, (
                np.abs(ours - ref).max(), denom
            )

"""Post-training int8 serving path (dmf_tpu/ops/quant.py).

The reference has no quantized inference; these tests pin the PTQ math:
exactness when data is exactly int8-representable, bounded error on real
distributions, interceptor path-matching, and static-scale calibration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dmf_tpu.ops.quant import (
    build_quant_set,
    calibrate_act_scales,
    quantize_kernel_per_channel,
    quantized_apply,
)


class TwoConv(nn.Module):
    dilated: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="c1")(x)
        x = nn.relu(x)
        d = 2 if self.dilated else 1
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((d, d), (d, d)),
                    kernel_dilation=(d, d), name="c2", use_bias=False)(x)
        return x


def _exact_params(shapes_tree, rng):
    """Kernels as ints*scale with per-out-channel absmax forced to 127 so
    per-channel quantization is lossless."""

    def make(k):
        if k.ndim == 4:
            ints = rng.randint(-126, 127, k.shape).astype(np.float32)
            ints[0, 0, 0, :] = 127.0
            return jnp.asarray(ints * 0.01)
        return jnp.asarray(rng.randn(*k.shape).astype(np.float32) * 0.01)

    return jax.tree.map(make, shapes_tree)


class TestQuantMath:
    def test_kernel_roundtrip(self, rng):
        k = rng.randn(3, 3, 16, 8).astype(np.float32)
        q, scale = quantize_kernel_per_channel(k)
        assert q.dtype == np.int8 and scale.shape == (8,)
        back = q.astype(np.float32) * scale
        assert np.abs(back - k).max() <= scale.max() * 0.5 + 1e-7

    def test_exact_when_representable(self, rng):
        """int8 conv == fp conv exactly (mod fp32 epsilon) when weights and
        inputs are exactly int8*scale."""
        m = TwoConv()
        x0 = jnp.zeros((2, 16, 16, 8), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x0)
        p = _exact_params(v["params"], rng)
        v = {"params": p}
        xi = rng.randint(-126, 127, (2, 16, 16, 8)).astype(np.float32)
        xi.flat[0] = 127.0
        x = jnp.asarray(xi * 0.5)

        # first conv only: input exactly representable -> exact
        class One(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                return nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                               name="c1")(x)

        m1, v1 = One(), {"params": {"c1": p["c1"]}}
        q1 = build_quant_set(v1["params"], min_fan_in=8, min_out=8)
        ref = m1.apply(v1, x)
        out = quantized_apply(m1, v1, q1, x)
        rel = (np.abs(np.asarray(ref) - np.asarray(out)).max()
               / (np.abs(np.asarray(ref)).max() + 1e-9))
        assert rel < 1e-5

    def test_bounded_error_on_gaussian(self, rng):
        m = TwoConv()
        x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        qset = build_quant_set(v["params"], min_fan_in=8, min_out=8)
        assert sorted(qset) == ["/c1", "/c2"]
        ref = np.asarray(m.apply(v, x))
        out = np.asarray(quantized_apply(m, v, qset, x))
        rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, rel  # requantized chain, per-tensor acts

    def test_skips_small_convs(self, rng):
        m = TwoConv()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
        qset = build_quant_set(v["params"], min_fan_in=10_000, min_out=8)
        assert qset == {}
        x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
        # empty set -> bit-identical to the fp path
        assert np.array_equal(
            np.asarray(quantized_apply(m, v, qset, x)),
            np.asarray(m.apply(v, x)),
        )


class TestCalibration:
    def test_static_scales_recorded_and_used(self, rng):
        m = TwoConv()
        x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        qset = build_quant_set(v["params"], min_fan_in=8, min_out=8)
        calibrate_act_scales(m, v, qset, x)
        for key in ("/c1", "/c2"):
            assert "x_scale" in qset[key]
            assert float(qset[key]["x_scale"]) > 0
        # the first conv's calibrated scale equals abs-max(x)/127
        want = float(jnp.max(jnp.abs(x))) / 127.0
        assert abs(float(qset["/c1"]["x_scale"]) - want) < 1e-6 * want + 1e-9

        ref = np.asarray(m.apply(v, x))
        out = np.asarray(quantized_apply(m, v, qset, x))
        rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05, rel

    def test_percentile_calibration_clips_outliers(self, rng):
        """percentile<100 must give a smaller act scale than abs-max, and on
        an outlier-heavy distribution the forward must stay bounded-close."""
        m = TwoConv()
        x = rng.randn(2, 16, 16, 8).astype(np.float32)
        x[0, 0, 0, 0] = 80.0  # one wild outlier dominates abs-max
        x = jnp.asarray(x)
        v = m.init(jax.random.PRNGKey(0), x)

        q_max = build_quant_set(v["params"], min_fan_in=8, min_out=8)
        calibrate_act_scales(m, v, q_max, x)
        q_pct = build_quant_set(v["params"], min_fan_in=8, min_out=8)
        calibrate_act_scales(m, v, q_pct, x, percentile=99.9)

        s_max = float(q_max["/c1"]["x_scale"])
        s_pct = float(q_pct["/c1"]["x_scale"])
        assert s_pct < s_max * 0.5  # the outlier no longer sets the range

        ref = np.asarray(m.apply(v, x))
        out = np.asarray(quantized_apply(m, v, q_pct, x))
        # bulk activations use the finer grid; error stays bounded
        rel = np.abs(ref - out).mean() / (np.abs(ref).mean() + 1e-9)
        # the clipped outlier itself is mispredicted by construction; the
        # bound just pins that bulk error doesn't blow up
        assert rel < 0.15, rel

    def test_encoder_quantized_forward(self, rng):
        """End-to-end: quantize the real Encoder (no backbone, tiny) and
        check logits stay close to fp."""
        import dataclasses

        from dmf_tpu.config import default_parameters
        from dmf_tpu.models import Encoder

        cfg = default_parameters()
        mc = dataclasses.replace(
            cfg.dwi_model, channels=(16, 32, 64), input_size=32,
            use_backbone=False, proj_dim=8,
        )
        enc = Encoder(method="dwi", config=mc, channel_num=14, num_classes=4)
        x = jnp.asarray(rng.rand(2, 32, 32, 14).astype(np.float32))
        v = enc.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
        qset = build_quant_set(v["params"], min_fan_in=64, min_out=16)
        assert qset, "expected some quantizable convs in the encoder"
        calibrate_act_scales(enc, v, qset, x, train=False)
        ref_logits, _, ref_mask = enc.apply(v, x, train=False)
        q_logits, _, q_mask = quantized_apply(enc, v, qset, x, train=False)
        assert np.abs(np.asarray(ref_logits) - np.asarray(q_logits)).max() < 0.15
        # mask head consumes quantized features; probabilities stay close
        pr = jax.nn.sigmoid(ref_mask)
        pq = jax.nn.sigmoid(q_mask)
        assert np.abs(np.asarray(pr) - np.asarray(pq)).mean() < 0.05


class TestQuantizedPredictor:
    def test_fwd_override_composes_with_tta_mc(self, rng):
        """The quantized per-pass forward plugs into make_fusion_predictor
        and produces probabilities close to the fp predictor."""
        import dataclasses

        from dmf_tpu.config import default_parameters
        from dmf_tpu.evals.predict import make_fusion_predictor
        from dmf_tpu.models import Encoder, FusionModel
        from dmf_tpu.ops.quant import (
            make_quantized_fusion_apply,
            make_quantized_fusion_fwd,
        )
        from dmf_tpu.utils.init import init_on_cpu

        cfg = default_parameters(batch_size=2)
        mc = dataclasses.replace(
            cfg.dwi_model, channels=(8, 16, 32), input_size=32,
            use_backbone=False, proj_dim=8,
        )
        fs = dataclasses.replace(cfg.fusion_model.fusion_specific,
                                 dwi_out_channels=32, dce_out_channels=32)
        fmc = dataclasses.replace(mc, fusion_specific=fs)
        cfg = cfg.replace(dwi_model=mc, dce_model=mc, fusion_model=fmc,
                          mc_passes=2)

        dwi = Encoder(method="dwi", config=mc, channel_num=14, num_classes=4)
        dce = Encoder(method="dce", config=mc, channel_num=6, num_classes=4)
        fusion = FusionModel(config=fmc, num_classes=4)
        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        xd = jnp.asarray(rng.rand(2, 32, 32, 14).astype(np.float32))
        xc = jnp.asarray(rng.rand(2, 32, 32, 6).astype(np.float32))

        def init_all():
            dv = dwi.init(k, xd, train=False)
            cv = dce.init(k, xc, train=False)
            _, da, dm = dwi.apply(dv, xd, train=False)
            _, ca, cm = dce.apply(cv, xc, train=False)
            fv = fusion.init(k, da["raw_feats"], ca["raw_feats"], dm, cm,
                             train=False)
            return dv, cv, fv

        dv, cv, fv = init_all()
        variables = {"dwi": dv, "dce": cv, "fusion": fv}
        _, qsets = make_quantized_fusion_apply(
            dwi, dce, fusion, variables, calibration=(xd, xc),
            min_fan_in=64, min_out=16)
        qfwd = make_quantized_fusion_fwd(dwi, dce, fusion, qsets)

        key = jax.random.PRNGKey(3)
        fp_pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc")
        q_pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc",
                                       fwd_override=qfwd)
        mp, sp, _ = fp_pred(dv, cv, fv, xd, xc, key)
        mq, sq, _ = q_pred(dv, cv, fv, xd, xc, key)
        assert mp.shape == mq.shape == (2, 4)
        # same rngs, same ensemble structure -> probabilities close AND the
        # served classification decisions agree (the deployment-relevant
        # int8-accuracy criterion bench.py --int8 reports at full scale)
        assert np.abs(np.asarray(mp) - np.asarray(mq)).max() < 0.05
        assert np.array_equal(np.asarray(mp).argmax(-1),
                              np.asarray(mq).argmax(-1))


class TestHybridPrefix:
    """int8-deterministic-prefix + fp-stochastic-suffix serving
    (ops/quant.py::make_hybrid_fusion_fwd; bench.py --int8-prefix)."""

    def _tiny_fusion(self, rng):
        import dataclasses

        from dmf_tpu.config import default_parameters
        from dmf_tpu.models import Encoder, FusionModel

        cfg = default_parameters(batch_size=2)
        mc = dataclasses.replace(
            cfg.dwi_model, channels=(8, 16, 32), input_size=32,
            use_backbone=False, proj_dim=8,
        )
        fs = dataclasses.replace(cfg.fusion_model.fusion_specific,
                                 dwi_out_channels=32, dce_out_channels=32)
        fmc = dataclasses.replace(mc, fusion_specific=fs)
        cfg = cfg.replace(dwi_model=mc, dce_model=mc, fusion_model=fmc,
                          mc_passes=2)
        dwi = Encoder(method="dwi", config=mc, channel_num=14, num_classes=4)
        dce = Encoder(method="dce", config=mc, channel_num=6, num_classes=4)
        fusion = FusionModel(config=fmc, num_classes=4)
        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        xd = jnp.asarray(rng.rand(2, 32, 32, 14).astype(np.float32))
        xc = jnp.asarray(rng.rand(2, 32, 32, 6).astype(np.float32))
        dv = dwi.init(k, xd, train=False)
        cv = dce.init(k, xc, train=False)
        _, da, dm = dwi.apply(dv, xd, train=False)
        _, ca, cm = dce.apply(cv, xc, train=False)
        fv = fusion.init(k, da["raw_feats"], ca["raw_feats"], dm, cm,
                         train=False)
        return cfg, dwi, dce, fusion, dv, cv, fv, xd, xc

    def test_empty_qset_bit_identical_to_fp(self, rng):
        """With empty QuantSets the hybrid ensemble must be BIT-identical
        to the fp predictor: the stochastic suffix (and the rng stream,
        including the _dropout_key wrap) is exactly the fp program — the
        hybrid's only delta is the prefix quantization."""
        from dmf_tpu.evals.predict import make_fusion_predictor
        from dmf_tpu.ops.quant import make_hybrid_fusion_fwd

        cfg, dwi, dce, fusion, dv, cv, fv, xd, xc = self._tiny_fusion(rng)
        hfwd = make_hybrid_fusion_fwd(dwi, dce, fusion,
                                      {"dwi": {}, "dce": {}, "fusion": {}})
        key = jax.random.PRNGKey(3)
        fp_pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc")
        h_pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc",
                                       fwd_override=hfwd)
        mp, sp, _ = fp_pred(dv, cv, fv, xd, xc, key)
        mh, sh, _ = h_pred(dv, cv, fv, xd, xc, key)
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(mh))
        np.testing.assert_array_equal(np.asarray(sp), np.asarray(sh))

    def test_backbone_prefix_quantized_close(self):
        """Real shape of the hybrid: ResNet50-backboned encoders whose
        prefix (backbone + adapter) runs int8 while the MC suffix stays
        fp — ensemble probabilities close, served argmax identical."""
        import dataclasses

        from dmf_tpu.config import default_parameters, resolve_backbone_config
        from dmf_tpu.evals.predict import make_fusion_predictor
        from dmf_tpu.models import Encoder, FusionModel
        from dmf_tpu.models.backbones import resnet50_features
        from dmf_tpu.ops.quant import (
            build_quant_set,
            calibrate_act_scales,
            make_hybrid_fusion_fwd,
        )

        cfg = default_parameters(batch_size=1, mc_passes=2)
        mc = dataclasses.replace(
            resolve_backbone_config(cfg.dwi_model), input_size=32)
        fmc = dataclasses.replace(mc,
                                  fusion_specific=cfg.fusion_model.fusion_specific)
        cfg = cfg.replace(dwi_model=mc, dce_model=mc, fusion_model=fmc)
        dwi = Encoder(method="dwi", config=mc, channel_num=14, num_classes=4,
                      backbone=resnet50_features(14))
        dce = Encoder(method="dce", config=mc, channel_num=6, num_classes=4,
                      backbone=resnet50_features(6))
        fusion = FusionModel(config=fmc, num_classes=4)
        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        xd = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 14))
        xc = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 6))
        dv = dwi.init(k, xd, train=False)
        cv = dce.init(k, xc, train=False)
        _, da, dm = dwi.apply(dv, xd, train=False)
        _, ca, cm = dce.apply(cv, xc, train=False)
        fv = fusion.init(k, da["raw_feats"], ca["raw_feats"], dm, cm,
                         train=False)

        qsets = {
            "dwi": build_quant_set(dv["params"]),
            "dce": build_quant_set(cv["params"]),
            "fusion": {},  # hybrid never quantizes the fusion head
        }
        assert qsets["dwi"], "backbone convs must be quantizable"
        calibrate_act_scales(dwi, dv, qsets["dwi"], xd, train=False)
        calibrate_act_scales(dce, cv, qsets["dce"], xc, train=False)
        hfwd = make_hybrid_fusion_fwd(dwi, dce, fusion, qsets)

        key = jax.random.PRNGKey(7)
        fp_pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc")
        h_pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc",
                                       fwd_override=hfwd)
        mp, sp, _ = fp_pred(dv, cv, fv, xd, xc, key)
        mh, sh, _ = h_pred(dv, cv, fv, xd, xc, key)
        # int8 error enters only through the shared prefix features
        assert np.abs(np.asarray(mp) - np.asarray(mh)).max() < 0.05
        assert np.array_equal(np.asarray(mp).argmax(-1),
                              np.asarray(mh).argmax(-1))
        assert np.abs(np.asarray(sp) - np.asarray(sh)).max() < 0.05

"""TTA x MC inference invariants — the reference debug suite's checks
(debug_suite.py:140-199) as proper tests, against the vmapped predictors."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.config import default_parameters
from dmf_tpu.evals import make_fusion_predictor, make_single_predictor, tta_views
from dmf_tpu.models import Encoder, FusionModel


def tiny_cfg(**kw):
    cfg = default_parameters(mc_passes=4, **kw)
    mc = dataclasses.replace(
        cfg.dwi_model, channels=(8, 16, 32), input_size=32,
        use_backbone=False, proj_dim=8, dropout=0.3,
    )
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=32, dce_out_channels=32,
    )
    fmc = dataclasses.replace(mc, fusion_specific=fs)
    return cfg.replace(dwi_model=mc, dce_model=mc, fusion_model=fmc)


@pytest.fixture(scope="module")
def encoder_setup():
    cfg = tiny_cfg()
    model = Encoder(method="dwi", config=cfg.dwi_model,
                    channel_num=5, num_classes=4)
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 5))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return cfg, model, variables, x


class TestTTAViews:
    def test_views_shape_and_content(self):
        x = jnp.arange(2 * 4 * 4 * 1.0).reshape(2, 4, 4, 1)
        v = tta_views(x)
        assert v.shape == (8, 4, 4, 1)
        assert np.allclose(v[:2], x)
        assert np.allclose(v[2:4], x[:, :, ::-1])  # lr
        assert np.allclose(v[4:6], x[:, ::-1])  # ud
        assert np.allclose(v[6:8], x[:, ::-1, ::-1])


class TestSinglePredictor:
    def test_normal_deterministic(self, encoder_setup):
        cfg, model, variables, x = encoder_setup
        pred = make_single_predictor(cfg, model, mode="normal")
        m1, s1, _ = pred(variables, x, jax.random.PRNGKey(0))
        m2, s2, _ = pred(variables, x, jax.random.PRNGKey(7))
        assert np.allclose(np.asarray(m1), np.asarray(m2))
        assert np.all(np.asarray(s1) == 0)
        assert np.allclose(np.asarray(m1).sum(-1), 1.0, atol=1e-5)

    def test_mc_has_variance(self, encoder_setup):
        # debug_suite.py:140-153: MC dropout must produce variance
        cfg, model, variables, x = encoder_setup
        pred = make_single_predictor(cfg, model, mode="mc")
        m, s, _ = pred(variables, x, jax.random.PRNGKey(0))
        assert float(np.asarray(s).mean()) > 1e-6

    def test_tta_changes_predictions(self, encoder_setup):
        # debug_suite.py:157-166: TTA output differs from a plain forward
        cfg, model, variables, x = encoder_setup
        normal = make_single_predictor(cfg, model, mode="normal")
        tta = make_single_predictor(cfg, model, mode="tta")
        mn, _, _ = normal(variables, x, jax.random.PRNGKey(0))
        mt, st, _ = tta(variables, x, jax.random.PRNGKey(0))
        assert not np.allclose(np.asarray(mn), np.asarray(mt), atol=1e-6)
        assert np.all(np.isfinite(np.asarray(st)))

    def test_tta_mc_pass_count_and_variance(self, encoder_setup):
        # debug_suite.py:170-177: TTA-MC variance >= MC variance (roughly)
        cfg, model, variables, x = encoder_setup
        mc = make_single_predictor(cfg, model, mode="mc")
        tta_mc = make_single_predictor(cfg, model, mode="tta_mc")
        _, s_mc, _ = mc(variables, x, jax.random.PRNGKey(0))
        m, s_ttamc, _ = tta_mc(variables, x, jax.random.PRNGKey(0))
        assert m.shape == (4, 4)
        assert float(np.asarray(s_ttamc).mean()) > 0.5 * float(
            np.asarray(s_mc).mean()
        )

    def test_mc_mean_more_stable_than_single_pass(self, encoder_setup):
        cfg, model, variables, x = encoder_setup
        pred = make_single_predictor(cfg, model, mode="mc", mc_passes=8)
        m1, _, _ = pred(variables, x, jax.random.PRNGKey(0))
        m2, _, _ = pred(variables, x, jax.random.PRNGKey(1))
        # different rng -> different but close means
        assert not np.allclose(np.asarray(m1), np.asarray(m2))
        assert np.abs(np.asarray(m1) - np.asarray(m2)).max() < 0.5


class TestFusionPredictor:
    def test_tta_mc_end_to_end(self):
        cfg = tiny_cfg()
        dwi = Encoder(method="dwi", config=cfg.dwi_model, channel_num=5,
                      num_classes=4)
        dce = Encoder(method="dce", config=cfg.dce_model, channel_num=6,
                      num_classes=4)
        fusion = FusionModel(config=cfg.fusion_model, num_classes=4)
        xd = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 5))
        xc = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 6))
        k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        dwi_vars = dwi.init(k, xd, train=False)
        dce_vars = dce.init(k, xc, train=False)
        _, dwi_aux, dwi_m = dwi.apply(dwi_vars, xd, train=False)
        _, dce_aux, dce_m = dce.apply(dce_vars, xc, train=False)
        fusion_vars = fusion.init(
            k, dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
            train=False,
        )
        pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc",
                                     mc_passes=2)
        m, s, aux = pred(dwi_vars, dce_vars, fusion_vars, xd, xc,
                         jax.random.PRNGKey(0))
        assert m.shape == (2, 4)
        assert float(np.asarray(s).mean()) > 0
        assert aux["gating_weights"].shape[-1] == 2


class TestMCChunking:
    """``mc_chunk`` trades vmap width for sequential lax.map steps to bound
    MC activation memory (the B>=64 tta_mc OOM); outputs must be EXACTLY
    the unchunked ensemble (same rng splits, same pass order)."""

    @pytest.mark.parametrize("chunk", [1, 2, 4, 16])
    def test_chunked_equals_unchunked_single(self, encoder_setup, chunk):
        cfg, model, variables, x = encoder_setup
        key = jax.random.PRNGKey(13)
        base = make_single_predictor(cfg, model, mode="tta_mc", mc_passes=6)
        chunked = make_single_predictor(cfg, model, mode="tta_mc",
                                        mc_passes=6, mc_chunk=chunk)
        m0, s0, _ = base(variables, x, key)
        m1, s1, _ = chunked(variables, x, key)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-7)

    def test_cfg_mc_chunk_default_flows_to_predictor(self, encoder_setup):
        """cfg.mc_chunk is the production default (CLI --mc-chunk); an
        explicit maker argument overrides it."""
        cfg, model, variables, x = encoder_setup
        key = jax.random.PRNGKey(17)
        base = make_single_predictor(cfg, model, mode="mc", mc_passes=5)
        via_cfg = make_single_predictor(cfg.replace(mc_chunk=2), model,
                                        mode="mc", mc_passes=5)
        m0, s0, _ = base(variables, x, key)
        m1, s1, _ = via_cfg(variables, x, key)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-7)

    def test_chunked_equals_unchunked_fusion(self):
        cfg = tiny_cfg()
        dwi = Encoder(method="dwi", config=cfg.dwi_model, channel_num=5,
                      num_classes=4)
        dce = Encoder(method="dce", config=cfg.dce_model, channel_num=6,
                      num_classes=4)
        fusion = FusionModel(config=cfg.fusion_model, num_classes=4)
        xd = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 5))
        xc = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 6))
        k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        dwi_vars = dwi.init(k, xd, train=False)
        dce_vars = dce.init(k, xc, train=False)
        _, dwi_aux, dwi_m = dwi.apply(dwi_vars, xd, train=False)
        _, dce_aux, dce_m = dce.apply(dce_vars, xc, train=False)
        fusion_vars = fusion.init(
            k, dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
            train=False,
        )
        key = jax.random.PRNGKey(21)
        base = make_fusion_predictor(cfg, dwi, dce, fusion, mode="mc",
                                     mc_passes=5)
        chunked = make_fusion_predictor(cfg, dwi, dce, fusion, mode="mc",
                                        mc_passes=5, mc_chunk=3)
        m0, s0, _ = base(dwi_vars, dce_vars, fusion_vars, xd, xc, key)
        m1, s1, _ = chunked(dwi_vars, dce_vars, fusion_vars, xd, xc, key)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=1e-5, atol=1e-7)


class TestRbgDropoutKeys:
    """DMF_MC_RBG=1 re-wraps per-pass dropout keys onto the hardware-bit-
    generator PRNG: still a deterministic, varying MC ensemble."""

    def test_rbg_deterministic_and_stochastic(self, encoder_setup,
                                              monkeypatch):
        cfg, model, variables, x = encoder_setup
        monkeypatch.setenv("DMF_MC_RBG", "1")
        pred = make_single_predictor(cfg, model, mode="mc", mc_passes=4)
        m1, s1, _ = pred(variables, x, jax.random.PRNGKey(0))
        m2, _, _ = pred(variables, x, jax.random.PRNGKey(0))
        m3, _, _ = pred(variables, x, jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        assert not np.allclose(np.asarray(m1), np.asarray(m3))
        assert float(np.asarray(s1).mean()) > 1e-6
        assert np.allclose(np.asarray(m1).sum(-1), 1.0, atol=1e-5)


class TestPrefixHoistEquivalence:
    """The mc/tta_mc predictors hoist the deterministic encoder prefix
    (modality SE + backbone adapter) out of the per-pass vmap; results must
    EXACTLY match per-pass full forwards with the same dropout rng splits."""

    def _naive_single(self, cfg, model, variables, imgs, rng, mode, passes):
        xt = tta_views(imgs) if mode == "tta_mc" else imgs
        n_views = 4 if mode == "tta_mc" else 1
        B = imgs.shape[0]
        rngs = jax.random.split(rng, passes)
        probs = []
        for r in rngs:
            logits, _, _ = model.apply(variables, xt, train=False, mc=True,
                                       rngs={"dropout": r})
            probs.append(jax.nn.softmax(logits, axis=-1))
        probs = jnp.stack(probs).reshape(passes * n_views, B, -1)
        return probs.mean(0), jnp.std(probs, axis=0, ddof=1)

    @pytest.mark.parametrize("mode", ["mc", "tta_mc"])
    def test_single_predictor_matches_naive(self, encoder_setup, mode):
        cfg, model, variables, x = encoder_setup
        pred = make_single_predictor(cfg, model, mode=mode, mc_passes=3)
        key = jax.random.PRNGKey(11)
        m, s, _ = pred(variables, x, key)
        m_ref, s_ref = self._naive_single(cfg, model, variables, x, key,
                                          mode, 3)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-6)

    def test_single_predictor_matches_naive_with_backbone(self):
        from dmf_tpu.config import resolve_backbone_config
        from dmf_tpu.models.backbones import resnet50_features

        cfg = default_parameters(mc_passes=2)
        mc = dataclasses.replace(
            resolve_backbone_config(cfg.dwi_model), input_size=32,
        )
        cfg = cfg.replace(dwi_model=mc)
        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=14,
                        num_classes=4, backbone=resnet50_features(14))
        x = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 14))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=False,
        )
        pred = make_single_predictor(cfg, model, mode="mc", mc_passes=2)
        key = jax.random.PRNGKey(2)
        m, s, _ = pred(variables, x, key)
        m_ref, s_ref = self._naive_single(cfg, model, variables, x, key,
                                          "mc", 2)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_fusion_predictor_matches_naive(self):
        cfg = tiny_cfg()
        dwi = Encoder(method="dwi", config=cfg.dwi_model, channel_num=5,
                      num_classes=4)
        dce = Encoder(method="dce", config=cfg.dce_model, channel_num=6,
                      num_classes=4)
        fusion = FusionModel(config=cfg.fusion_model, num_classes=4)
        xd = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 5))
        xc = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 6))
        k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        dwi_vars = dwi.init(k, xd, train=False)
        dce_vars = dce.init(k, xc, train=False)
        _, dwi_aux, dwi_m = dwi.apply(dwi_vars, xd, train=False)
        _, dce_aux, dce_m = dce.apply(dce_vars, xc, train=False)
        fusion_vars = fusion.init(
            k, dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
            train=False,
        )
        passes = 3
        pred = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta_mc",
                                     mc_passes=passes)
        key = jax.random.PRNGKey(9)
        m, s, _ = pred(dwi_vars, dce_vars, fusion_vars, xd, xc, key)

        xtd, xtc = tta_views(xd), tta_views(xc)
        probs = []
        for r in jax.random.split(key, passes):
            rngs = {"dropout": r}
            _, d_aux, d_m = dwi.apply(dwi_vars, xtd, train=False, mc=True,
                                      rngs=rngs)
            _, c_aux, c_m = dce.apply(dce_vars, xtc, train=False, mc=True,
                                      rngs=rngs)
            logits, _, _ = fusion.apply(
                fusion_vars, d_aux["raw_feats"], c_aux["raw_feats"], d_m,
                c_m, train=False, mc=True, rngs=rngs,
            )
            probs.append(jax.nn.softmax(logits, axis=-1))
        probs = jnp.stack(probs).reshape(passes * 4, 2, -1)
        np.testing.assert_allclose(np.asarray(m), np.asarray(probs.mean(0)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(jnp.std(probs, axis=0, ddof=1)),
            rtol=1e-4, atol=1e-6)

"""TTA-predictor race vs the GENUINE reference ``predict_tta``.

VERDICT r4 #3: ``make_single_predictor`` was verified only against an
in-repo naive implementation — never against the genuine
``LightningSingleModel.predict_custom(mode="tta")`` (train.py:541-565,
608-631) / ``LightningFusionModel.predict_tta`` (train_fusion.py:543-632).
The deterministic TTA mode is exactly raceable: dropout off, BN on running
stats, no rng — the only degrees of freedom are the view set
(train.py:916-923), flip axes, view order, and the mean/std reduction
(torch unbiased std).  These tests import identical weights through
``ref_ckpt`` and assert our one-compiled-program ensemble reproduces the
genuine 4-view Python loop's mean/std (and, for fusion, the spatially
collapsed mean gating) to fp32 tolerance.

MC modes draw different rng streams by construction and cannot be raced
bit-for-bit; their semantics (BN frozen, dropout active, unbiased std) are
pinned by tests/test_predict.py against a naive in-repo loop.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dmf_tpu.config import default_parameters, to_reference_dict
from dmf_tpu.evals.predict import make_fusion_predictor, make_single_predictor
from dmf_tpu.models import Encoder, FusionModel
from dmf_tpu.models.ref_ckpt import (
    import_reference_encoder,
    import_reference_fusion,
)

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

from tests.test_importers import _randomize, t_in  # noqa: E402
from tests.test_ref_ckpt import tiny_cfg  # noqa: E402
from tests.test_ref_trajectory import _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def ref_stack():
    _install_stubs()
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model_module
    import train as ref_train
    import train_fusion as ref_train_fusion

    return model_module, ref_train, ref_train_fusion


def fusion_tiny_cfg():
    cfg = tiny_cfg()
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=32, dce_out_channels=32,
    )
    fmc = dataclasses.replace(cfg.dwi_model, fusion_specific=fs)
    return cfg.replace(fusion_model=fmc)


class TestSingleTTARace:
    def test_tta_matches_genuine_predict_tta(self, ref_stack):
        """Our jitted mode="tta" predictor reproduces the genuine
        predict_custom(mode="tta") 4-view loop (train.py:541-565) —
        mean probs AND the unbiased view-std — from identical weights."""
        mm, tr, _ = ref_stack
        cfg = tiny_cfg()
        refd = to_reference_dict(cfg)
        ref_model = mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        _randomize(ref_model, seed=41)
        ref_model.eval()

        lm = tr.LightningSingleModel(
            model=ref_model, method="dwi", criterion_clf=None,
            optimizer_fn=None, scheduler_fn=None, parameters_dict=refd,
            paths=None,
        )
        lm.eval()

        B, S, C = 3, 32, cfg.dwi_channel_num
        rng = np.random.RandomState(8)
        x = rng.rand(B, S, S, C).astype(np.float32)
        labels = torch.tensor((np.arange(B) % cfg.class_num).astype(np.int64))
        with torch.no_grad():
            t_mean, t_std = lm.predict_custom((t_in(x), labels), mode="tta")

        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num)
        template = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x), train=False,
        )
        variables = jax.tree.map(
            jnp.asarray,
            import_reference_encoder(ref_model.state_dict(), template),
        )
        predict = make_single_predictor(cfg, model, mode="tta")
        mean, std, _aux = predict(variables, jnp.asarray(x),
                                  jax.random.PRNGKey(0))

        np.testing.assert_allclose(np.asarray(mean), t_mean.numpy(),
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(std), t_std.numpy(),
                                   rtol=2e-3, atol=2e-6)
        # non-vacuity: the pooled classifier is near flip-invariant (both
        # sides' view-std is ~1e-8), so prove the 4 views actually ran
        # distinct inputs via the flip-COVARIANT spatial features
        f0 = np.asarray(_aux["raw_feats"][0]).reshape(4, B, -1)
        assert np.abs(f0[0] - f0[1]).max() > 1e-3

    def test_view_set_matches_reference_transforms(self, ref_stack):
        """tta_views' folded batch reproduces each genuine transform
        (train.py:916-923) view-for-view, in the reference list order
        (train.py:104-108) — pins flip axes AND ordering, which mean/std
        alone cannot distinguish."""
        _, tr, _ = ref_stack
        from dmf_tpu.evals.predict import tta_views

        rng = np.random.RandomState(3)
        x = rng.rand(2, 5, 7, 3).astype(np.float32)
        ours = np.asarray(tta_views(jnp.asarray(x)))  # (4B, H, W, C)
        t_x = t_in(x)
        genuine = [tr.tta_id, tr.tta_flip_lr, tr.tta_flip_ud,
                   tr.tta_flip_lrud]
        for i, t in enumerate(genuine):
            want = t(x=t_x).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_array_equal(ours[2 * i:2 * (i + 1)], want)


class TestFusionTTARace:
    def test_fusion_tta_matches_genuine(self, ref_stack):
        """Fusion TTA: our one-program ensemble vs the genuine
        LightningFusionModel.predict_tta 4-view loop over
        forward_from_inputs (train_fusion.py:543-632, 670-677) — mean/std
        probs and the spatially collapsed mean gating weights."""
        mm, _, trf = ref_stack
        cfg = fusion_tiny_cfg()
        refd = to_reference_dict(cfg)
        dwi_m = mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        dce_m = mm.ModelMaskHeadBackbone("dce", refd, backbone=None)
        fus_m = mm.FusionModel(refd)
        _randomize(dwi_m, seed=51)
        _randomize(dce_m, seed=52)
        _randomize(fus_m, seed=53)

        lm = trf.LightningFusionModel(
            dwi_model=dwi_m, dce_model=dce_m, fusion_model=fus_m,
            parameters_dict=refd, criterion_clf=None,
            optimizer_fn=None, scheduler_fn=None, paths=None,
        )
        lm.eval()

        B, S = 3, 32
        rng = np.random.RandomState(9)
        # iid noise alone downsamples to a flip-symmetric deep map at this
        # tiny geometry; a strong W-ramp keeps the lr-flip view detectably
        # distinct in the spatial aux (the non-vacuity probe below)
        ramp = np.linspace(0.0, 1.0, S, dtype=np.float32)[None, None, :, None]
        xd = (0.5 * rng.rand(B, S, S, cfg.dwi_channel_num) + ramp).astype(
            np.float32)
        xc = (0.5 * rng.rand(B, S, S, cfg.dce_channel_num) + ramp).astype(
            np.float32)
        labels = torch.tensor((np.arange(B) % cfg.class_num).astype(np.int64))
        with torch.no_grad():
            t_mean, t_std, t_aux = lm.predict_custom(
                (t_in(xd), t_in(xc), labels), mode="tta")

        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        dwi = Encoder(method="dwi", config=cfg.dwi_model,
                      channel_num=cfg.dwi_channel_num,
                      num_classes=cfg.class_num)
        dce = Encoder(method="dce", config=cfg.dce_model,
                      channel_num=cfg.dce_channel_num,
                      num_classes=cfg.class_num)
        fusion = FusionModel(config=cfg.fusion_model,
                             num_classes=cfg.class_num)
        jd, jc = jnp.asarray(xd), jnp.asarray(xc)
        dwi_t = dwi.init(k, jd, train=False)
        dce_t = dce.init(k, jc, train=False)
        _, d_aux, d_m = dwi.apply(dwi_t, jd, train=False)
        _, c_aux, c_m = dce.apply(dce_t, jc, train=False)
        fus_t = fusion.init(k, d_aux["raw_feats"], c_aux["raw_feats"],
                            d_m, c_m, train=False)
        dwi_v = jax.tree.map(jnp.asarray, import_reference_encoder(
            dwi_m.state_dict(), dwi_t))
        dce_v = jax.tree.map(jnp.asarray, import_reference_encoder(
            dce_m.state_dict(), dce_t))
        fus_v = jax.tree.map(jnp.asarray, import_reference_fusion(
            fus_m.state_dict(), fus_t))

        predict = make_fusion_predictor(cfg, dwi, dce, fusion, mode="tta")
        mean, std, aux = predict(dwi_v, dce_v, fus_v, jd, jc,
                                 jax.random.PRNGKey(0))

        np.testing.assert_allclose(np.asarray(mean), t_mean.numpy(),
                                   rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(np.asarray(std), t_std.numpy(),
                                   rtol=2e-3, atol=2e-6)
        # non-vacuity: the 0.05-scaled random weights saturate deep
        # activations to BN constants, so a view-covariance probe on the
        # fused aux is vacuous here.  Instead prove the predictor actually
        # ran the 4-view fold end-to-end: its aux must equal a MANUAL pass
        # of tta_views through both encoders + fusion (the view-set test
        # above pins that those 4 views are distinct and reference-ordered).
        from dmf_tpu.evals.predict import tta_views
        _, da, dm = dwi.apply(dwi_v, tta_views(jd), train=False)
        _, ca, cm = dce.apply(dce_v, tta_views(jc), train=False)
        _, _, manual_aux = fusion.apply(
            fus_v, da["raw_feats"], ca["raw_feats"], dm, cm, train=False)
        np.testing.assert_allclose(
            np.asarray(aux["recon_fused"]),
            np.asarray(manual_aux["recon_fused"]), rtol=1e-5, atol=1e-6)

        # mean gating over views — the genuine loop averages per-view (B,C)
        # gating, already spatially collapsed (train_fusion.py:560-571)
        gw = np.asarray(aux["gating_weights"]).reshape(4, B, -1).mean(0)
        np.testing.assert_allclose(gw, t_aux["gating_weights"].numpy(),
                                   rtol=2e-4, atol=2e-6)

"""FULL-GEOMETRY parity race vs the GENUINE reference (VERDICT r4 #1).

Every other genuine-module race runs at 32²–128² toy geometry with shrunken
channel stacks.  These tests run the flagship shapes the production path
actually ships — 256² inputs, DWI 14ch / DCE 6ch, channels (128,256,512),
the dilated stride-8 ResNet50 pyramid (reference foundation_model.py:15-68
``output_stride=8``) — in fp32 on CPU, both sides from the same imported
weights, exercising the geometry-dependent code no toy race touches:

- the BackboneAdapter neck flow at real 64²/32² pyramid sizes
  (model_module.py:401-476) and the f2/f3 α-blends (:673-675, 688-690);
- the MaskHeadResize static chain at the 128→32 entry, which only the
  NO-backbone encoder at 256² dispatches (model_module.py:190-215 — with a
  backbone the mask-stage feature map is already 32²);
- the 4×4-token cross-attention pooling from real 32² fused maps
  (model_module.py:963-973) and the fused mask/recon heads;
- real-ratio bilinear/nearest resizes (dataset.py:79-88,
  prepare_single_model.py:357-359);
- 2 full train steps of the fusion stack (composite loss + grouped AdamW)
  at flagship geometry.

Slow by construction (minutes of torch + XLA:CPU time at 256²): gated
behind ``DMF_FULLGEOM=1`` and marked ``fullgeom`` — run once per round
(`DMF_FULLGEOM=1 python -m pytest tests/test_ref_fullgeom.py -q`).
Measured on this host (1 CPU core, warm .jax_cache): ~5 min total
(forwards 25+43 s, 2-step train race 215 s, resize races 5 s).
"""

import dataclasses
import os

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
)

REF = "/root/reference/code"
pytestmark = [
    pytest.mark.fullgeom,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not mounted"),
    pytest.mark.skipif(os.environ.get("DMF_FULLGEOM") != "1",
                       reason="set DMF_FULLGEOM=1 (slow full-geometry race; "
                              "run once per round)"),
]

from tests.test_importers import TimmResNet50, _randomize, t_in  # noqa: E402
from tests.test_ref_ckpt import assert_close  # noqa: E402
from tests.test_ref_trajectory import _install_stubs  # noqa: E402

S = 256
B = 2


@pytest.fixture(scope="module")
def ref_stack():
    _install_stubs()
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model_module
    import selector_helpers
    import train_fusion

    return model_module, selector_helpers, train_fusion


class _FeatureInfo:
    def channels(self):
        return [256, 512, 1024, 2048]

    def reduction(self):
        return [4, 8, 8, 8]


class FakeTimm(TimmResNet50):
    """timm-layout dilated stride-8 ResNet50 (the radimagenet geometry)."""

    feature_info = _FeatureInfo()


def flagship_cfg(dropout=0.2):
    """The DEFAULT config with backbone-derived fields resolved — nothing
    shrunk: 256², channels (128,256,512), radimagenet chains, fusion
    512/512→128 (parameters_generate.py:64-171 defaults)."""
    cfg = default_parameters()
    dwi_mc = dataclasses.replace(resolve_backbone_config(cfg.dwi_model),
                                 dropout=dropout)
    dce_mc = dataclasses.replace(resolve_backbone_config(cfg.dce_model),
                                 dropout=dropout)
    fus_mc = dataclasses.replace(
        dwi_mc, fusion_specific=cfg.fusion_model.fusion_specific)
    return cfg.replace(dwi_model=dwi_mc, dce_model=dce_mc,
                       fusion_model=fus_mc)


def _build_genuine_encoder(mm, refd, method, channel_num, seed):
    backbone = FakeTimm(in_ch=channel_num)
    model = mm.ModelMaskHeadBackbone(method, refd, backbone=backbone)
    _randomize(model, seed=seed)
    model.eval()
    return model


def _import_encoder(cfg, method, channel_num, ref_model, x):
    from dmf_tpu.models.backbones import resnet50_features

    model = Encoder(method=method, config=cfg.model_config(method),
                    channel_num=channel_num, num_classes=cfg.class_num,
                    backbone=resnet50_features(channel_num))
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    variables = jax.tree.map(
        jnp.asarray,
        import_reference_encoder(ref_model.state_dict(), template))
    return model, variables


class TestFlagshipForward256:
    def test_backboned_encoder_forward(self, ref_stack):
        """The flagship DWI encoder at 256²/14ch: genuine dilated stride-8
        pyramid + adapter necks + α-blends vs ours, B=2 fp32."""
        mm = ref_stack[0]
        cfg = flagship_cfg()
        refd = to_reference_dict(cfg)
        C = cfg.dwi_channel_num
        assert C == 14 and cfg.dwi_model.input_size == S
        assert cfg.dwi_model.channels == (128, 256, 512)
        ref_model = _build_genuine_encoder(mm, refd, "dwi", C, seed=61)

        rng = np.random.RandomState(10)
        x = rng.rand(B, S, S, C).astype(np.float32)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))
        # geometry sanity: this IS the full pyramid (f1 32² from the 64²
        # stride-4 C2 via block1 downsample, f2/f3 32² stride-8)
        assert tuple(t_aux["raw_feats"][0].shape[-2:]) == (32, 32)
        assert t_aux["raw_feats"][2].shape[1] == 512
        assert tuple(t_mask.shape[-2:]) == (32, 32)

        jx = jnp.asarray(x)
        model, variables = _import_encoder(cfg, "dwi", C, ref_model, jx)
        logits, aux, mask_pred = model.apply(variables, jx, train=False)

        assert_close(logits, t_logits, "logits", rtol=1e-4)
        assert_close(mask_pred, t_mask, "mask_pred", rtol=1e-4)
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i],
                         f"f{i + 1}", rtol=1e-4)
        for i in range(2):
            assert_close(aux["recon_feats"][i], t_aux["recon_feats"][i],
                         f"r{i + 1}", rtol=1e-4)
        for i in range(4):
            assert_close(aux["proj_pairs"][i], t_aux["proj_pairs"][i],
                         f"proj{i}", rtol=1e-4)

    def test_nobackbone_encoder_forward_hits_128to32_mask_chain(
            self, ref_stack):
        """use_backbone=False at 256² (driver config #1): f2 sits at 128²,
        so the mask head dispatches the 128→32 strided-conv chain
        (model_module.py:190-215) — unreachable from any toy race."""
        mm = ref_stack[0]
        cfg = default_parameters()
        mc = dataclasses.replace(cfg.dwi_model, use_backbone=False)
        cfg = cfg.replace(dwi_model=mc)
        refd = to_reference_dict(cfg)
        C = cfg.dwi_channel_num
        ref_model = mm.ModelMaskHeadBackbone("dwi", refd, backbone=None)
        _randomize(ref_model, seed=62)
        ref_model.eval()

        rng = np.random.RandomState(11)
        x = rng.rand(B, S, S, C).astype(np.float32)
        with torch.no_grad():
            t_logits, t_aux, t_mask = ref_model(t_in(x))
        assert tuple(t_aux["raw_feats"][1].shape[-2:]) == (128, 128)
        assert tuple(t_mask.shape[-2:]) == (32, 32)

        model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C,
                        num_classes=cfg.class_num)
        jx = jnp.asarray(x)
        template = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, jx, train=False)
        variables = jax.tree.map(
            jnp.asarray,
            import_reference_encoder(ref_model.state_dict(), template))
        logits, aux, mask_pred = model.apply(variables, jx, train=False)

        assert_close(logits, t_logits, "logits", rtol=1e-4)
        assert_close(mask_pred, t_mask, "mask_pred", rtol=1e-4)
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i],
                         f"f{i + 1}", rtol=1e-4)

    def test_fusion_forward(self, ref_stack):
        """The full flagship stack end to end at 256²: two backboned
        encoders (14ch / 6ch) + genuine FusionModel — 4×4 cross-attention
        pooling from the real 32² fused map (model_module.py:963-973),
        fused mask/recon heads, gating."""
        mm = ref_stack[0]
        cfg = flagship_cfg()
        refd = to_reference_dict(cfg)
        Cd, Cc = cfg.dwi_channel_num, cfg.dce_channel_num
        assert (Cd, Cc) == (14, 6)
        dwi_m = _build_genuine_encoder(mm, refd, "dwi", Cd, seed=63)
        dce_m = _build_genuine_encoder(mm, refd, "dce", Cc, seed=64)
        fus_m = mm.FusionModel(refd)
        _randomize(fus_m, seed=65)
        fus_m.eval()

        rng = np.random.RandomState(12)
        xd = rng.rand(B, S, S, Cd).astype(np.float32)
        xc = rng.rand(B, S, S, Cc).astype(np.float32)
        with torch.no_grad():
            _, d_aux, d_mask = dwi_m(t_in(xd))
            _, c_aux, c_mask = dce_m(t_in(xc))
            t_logits, t_fmask, t_aux = fus_m(
                d_aux["raw_feats"], c_aux["raw_feats"], d_mask, c_mask)

        jd, jc = jnp.asarray(xd), jnp.asarray(xc)
        dwi, dwi_v = _import_encoder(cfg, "dwi", Cd, dwi_m, jd)
        dce, dce_v = _import_encoder(cfg, "dce", Cc, dce_m, jc)
        _, j_daux, j_dm = dwi.apply(dwi_v, jd, train=False)
        _, j_caux, j_cm = dce.apply(dce_v, jc, train=False)

        fusion = FusionModel(config=cfg.fusion_model,
                             num_classes=cfg.class_num)
        fus_t = fusion.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            j_daux["raw_feats"], j_caux["raw_feats"], j_dm, j_cm,
            train=False)
        fus_v = jax.tree.map(
            jnp.asarray,
            import_reference_fusion(fus_m.state_dict(), fus_t))
        logits, fused_mask, aux = fusion.apply(
            fus_v, j_daux["raw_feats"], j_caux["raw_feats"], j_dm, j_cm,
            train=False)

        assert_close(logits, t_logits, "fusion logits", rtol=1e-4)
        assert_close(fused_mask, t_fmask, "fused mask", rtol=1e-4)
        assert_close(aux["gating_weights"], t_aux["gating_weights"],
                     "gating", rtol=1e-4)
        assert_close(aux["recon_fused"], t_aux["recon_fused"], "recon",
                     rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(aux["attn_weights"]), t_aux["attn_weights"].numpy(),
            rtol=1e-3, atol=1e-5)


class TestFlagshipTrainSteps256:
    def test_fusion_two_train_steps(self, ref_stack):
        """2 genuine LightningFusionModel._shared_step + grouped-AdamW
        steps at FULL geometry (256², backboned 14/6ch encoders, real-ratio
        multi-scale recon resizes, train_fusion.py:204-330) vs
        make_fusion_train_step from the same imported weights."""
        mm, sh, trf = ref_stack
        cfg = flagship_cfg(dropout=0.0)  # determinism: rng-free both sides
        refd = to_reference_dict(cfg)
        Cd, Cc = cfg.dwi_channel_num, cfg.dce_channel_num
        dwi_m = _build_genuine_encoder(mm, refd, "dwi", Cd, seed=66)
        dce_m = _build_genuine_encoder(mm, refd, "dce", Cc, seed=67)
        fus_m = mm.FusionModel(refd)
        _randomize(fus_m, seed=68)

        n_steps = 2
        rng = np.random.RandomState(13)
        batches = []
        for i in range(n_steps):
            batches.append({
                "dwi": rng.rand(B, S, S, Cd).astype(np.float32),
                "dce": rng.rand(B, S, S, Cc).astype(np.float32),
                "masks": (rng.rand(B, 32, 32, 1) > 0.7).astype(np.float32),
                "labels": np.array([(2 * i) % 4, (2 * i + 1) % 4],
                                   np.int64),
            })
        train_labels = np.arange(cfg.class_num, dtype=np.int64)

        sds = {
            "dwi": {k: v.clone() for k, v in dwi_m.state_dict().items()},
            "dce": {k: v.clone() for k, v in dce_m.state_dict().items()},
            "fusion": {k: v.clone() for k, v in fus_m.state_dict().items()},
        }

        # --- genuine side ---
        criterion = sh.get_classification_loss(
            refd, torch.tensor(train_labels), "fusion", torch.device("cpu"))
        lm = trf.LightningFusionModel(
            dwi_model=dwi_m, dce_model=dce_m, fusion_model=fus_m,
            parameters_dict=refd, criterion_clf=criterion,
            optimizer_fn=None, scheduler_fn=None, paths=None)
        opt = lm.configure_optimizers()
        if isinstance(opt, dict):
            opt = opt["optimizer"]
        lm.train()
        t_losses = []
        for b in batches:
            batch = (t_in(b["dwi"]), t_in(b["dce"]), t_in(b["masks"]),
                     torch.tensor(b["labels"]))
            opt.zero_grad()
            loss = lm._shared_step(batch, "train")
            loss.backward()
            opt.step()
            t_losses.append(float(loss.detach()))

        # --- ours, from the identical initial weights ---
        from dmf_tpu.losses import (
            get_classification_loss_fn,
            get_mask_loss_fn,
        )
        from dmf_tpu.models.backbones import resnet50_features
        from dmf_tpu.train import FusionOptController, TrainState, adamw_init
        from dmf_tpu.train.fusion import (
            build_fusion_group_spec,
            make_fusion_train_step,
        )

        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        dwi = Encoder(method="dwi", config=cfg.dwi_model, channel_num=Cd,
                      num_classes=cfg.class_num,
                      backbone=resnet50_features(Cd))
        dce = Encoder(method="dce", config=cfg.dce_model, channel_num=Cc,
                      num_classes=cfg.class_num,
                      backbone=resnet50_features(Cc))
        fusion = FusionModel(config=cfg.fusion_model,
                             num_classes=cfg.class_num)
        xd = jnp.zeros((B, S, S, Cd))
        xc = jnp.zeros((B, S, S, Cc))
        dwi_t = dwi.init(k, xd, train=False)
        dce_t = dce.init(k, xc, train=False)
        _, d_aux, d_m = dwi.apply(dwi_t, xd, train=False)
        _, c_aux, c_m = dce.apply(dce_t, xc, train=False)
        fus_t = fusion.init(k, d_aux["raw_feats"], c_aux["raw_feats"],
                            d_m, c_m, train=False)
        dwi_v = jax.tree.map(jnp.asarray,
                             import_reference_encoder(sds["dwi"], dwi_t))
        dce_v = jax.tree.map(jnp.asarray,
                             import_reference_encoder(sds["dce"], dce_t))
        fus_v = jax.tree.map(jnp.asarray,
                             import_reference_fusion(sds["fusion"], fus_t))
        params = {"dwi": dwi_v["params"], "dce": dce_v["params"],
                  "fusion": fus_v["params"]}
        batch_stats = {"dwi": dwi_v.get("batch_stats", {}),
                       "dce": dce_v.get("batch_stats", {}),
                       "fusion": fus_v.get("batch_stats", {})}
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=adamw_init(params),
                           step=jnp.zeros((), jnp.int32))
        clf = get_classification_loss_fn(cfg, train_labels, "fusion")
        spec = build_fusion_group_spec(state.params, cfg)
        step = make_fusion_train_step(cfg, dwi, dce, fusion, clf,
                                      get_mask_loss_fn(cfg, "fusion"), spec,
                                      donate=False)
        hp = FusionOptController(cfg).hyperparams()
        j_losses = []
        for i, b in enumerate(batches):
            batch = {
                "dwi": jnp.asarray(b["dwi"]),
                "dce": jnp.asarray(b["dce"]),
                "masks": jnp.asarray(b["masks"]),
                "labels": jnp.asarray(b["labels"], jnp.int32),
                "aux_w": jnp.asarray(1.0, jnp.float32),
            }
            state, metrics = step(state, batch,
                                  jax.random.PRNGKey(200 + i), hp)
            j_losses.append(float(metrics["loss"]))

        np.testing.assert_allclose(
            j_losses, t_losses, rtol=1e-3,
            err_msg=f"ref={t_losses} ours={j_losses}")
        # non-vacuity: step 2's loss moved (the optimizer actually updated)
        assert abs(t_losses[1] - t_losses[0]) > 1e-6


class TestRealRatioResizes:
    """dataset.py:79-88 / prepare_single_model.py:357-359 at FLAGSHIP
    ratios — the toy races only cover small integer ratios."""

    def test_adc_bilinear_resize_to_256(self):
        from dmf_tpu.ops import resize_bilinear

        for src in (64, 100):  # integer and non-integer upscale ratios
            rng = np.random.RandomState(src)
            adc = rng.rand(1, src, src, 1).astype(np.float32)
            ours = np.asarray(resize_bilinear(jnp.asarray(adc), (S, S)))
            want = torch.nn.functional.interpolate(
                t_in(adc), size=(S, S), mode="bilinear",
                align_corners=False).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)

    def test_mask_nearest_resize_256_to_32(self):
        from dmf_tpu.ops import resize_nearest

        rng = np.random.RandomState(7)
        m = (rng.rand(2, S, S, 1) > 0.5).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(m), (32, 32)))
        want = torch.nn.functional.interpolate(
            t_in(m), size=(32, 32), mode="nearest").numpy().transpose(
            0, 2, 3, 1)
        np.testing.assert_array_equal(ours, want)

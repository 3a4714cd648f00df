"""FULL-MODEL numeric parity vs torch oracles (VERDICT round-1 item #2).

The AUC-parity north star ("within 0.01 of the PyTorch reference",
BASELINE.md) can't be an AUC number without the Kaggle dataset; this harness
is the strongest available proxy: a complete torch re-implementation of the
reference's computation graphs —

* ``ModelMaskHeadBackbone`` forward (model_module.py:481-733, the
  ``use_backbone=False`` custom path; the backboned path's pieces are pinned
  by tests/test_importers.py and tests/test_layer_parity.py),
* the composite single-model loss with the double lambda*aux_w quirk
  (train.py:294-428 + 462-464),
* ``FusionModel`` (model_module.py:919-1000) and the fusion composite loss
  (train_fusion.py:204-321),
* one grouped discriminative-LR AdamW update
  (selector_helpers.py:119-353 semantics)

— with weights transplanted from the Flax models, asserting logits, every
loss term, BN running-stat updates, and the post-step parameters agree.
Dropout is pinned to 0 (rng streams can't match across frameworks); every
other piece of the graph is exercised in both train and eval mode.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from dmf_tpu.config import default_parameters
from dmf_tpu.models import Encoder, FusionModel
from dmf_tpu.train import (
    SingleModelOptController,
    TrainState,
    build_group_spec,
    make_single_train_step,
)

# ---------------------------------------------------------------------------
# config under test: tiny but complete (every module on)
# ---------------------------------------------------------------------------

C_IN = 5
C1, C2, C3 = 8, 16, 32
PD = 4
NUM_CLASSES = 4
B = 4
S = 32


def parity_cfg():
    cfg = default_parameters(batch_size=B)
    mc = dataclasses.replace(
        cfg.dwi_model,
        channels=(C1, C2, C3), input_size=S, use_backbone=False,
        proj_dim=PD, dropout=0.0, use_se=True,
        enable_modality_attention=True,
    )
    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=C3, dce_out_channels=C3,
    )
    fmc = dataclasses.replace(mc, fusion_specific=fs)
    return cfg.replace(dwi_model=mc, dce_model=fmc, fusion_model=fmc)


# ---------------------------------------------------------------------------
# flax -> torch weight transplant helpers
# ---------------------------------------------------------------------------


def _get(tree, path):
    for k in path.split("/"):
        tree = tree[k]
    return tree


class W:
    """Weight source: flax (params, batch_stats) trees."""

    def __init__(self, variables):
        self.p = variables["params"]
        self.s = variables.get("batch_stats", {})

    def conv(self, in_ch, out_ch, k, path, stride=1, padding=0, bias=True):
        node = _get(self.p, path)
        c = tnn.Conv2d(in_ch, out_ch, k, stride=stride, padding=padding,
                       bias=bias)
        c.weight.data = torch.tensor(
            np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
        if bias:
            c.bias.data = torch.tensor(np.asarray(node["bias"]))
        return c

    def dense(self, in_f, out_f, path):
        node = _get(self.p, path)
        l = tnn.Linear(in_f, out_f)
        l.weight.data = torch.tensor(np.asarray(node["kernel"]).T)
        l.bias.data = torch.tensor(np.asarray(node["bias"]))
        return l

    def bn(self, ch, path):
        """path points at our BatchNorm wrapper dir (contains BatchNorm_0)."""
        node_p = _get(self.p, path + "/BatchNorm_0")
        node_s = _get(self.s, path + "/BatchNorm_0")
        bn = tnn.BatchNorm2d(ch)  # eps 1e-5, momentum 0.1 = torch defaults
        bn.weight.data = torch.tensor(np.asarray(node_p["scale"]))
        bn.bias.data = torch.tensor(np.asarray(node_p["bias"]))
        bn.running_mean.data = torch.tensor(np.asarray(node_s["mean"]))
        bn.running_var.data = torch.tensor(np.asarray(node_s["var"]))
        return bn

    def groupnorm(self, groups, ch, path):
        node = _get(self.p, path)
        gn = tnn.GroupNorm(groups, ch)  # eps 1e-5 default, matches ours now
        gn.weight.data = torch.tensor(np.asarray(node["scale"]))
        gn.bias.data = torch.tensor(np.asarray(node["bias"]))
        return gn

    def scalar(self, path):
        return torch.tensor(float(np.asarray(_get(self.p, path))))


# ---------------------------------------------------------------------------
# torch mirrors of the reference modules (model_module.py)
# ---------------------------------------------------------------------------


class TSE(tnn.Module):
    def __init__(self, w: W, prefix, ch, red=2):
        super().__init__()
        mid = max(ch // red, 1)
        self.fc1 = w.dense(ch, mid, f"{prefix}/Dense_0")
        self.fc2 = w.dense(mid, ch, f"{prefix}/Dense_1")

    def forward(self, x):
        v = TF.adaptive_avg_pool2d(x, 1).flatten(1)
        v = torch.sigmoid(self.fc2(TF.gelu(self.fc1(v))))
        return x * v[:, :, None, None], v


class TResLite(tnn.Module):
    """ResNetLiteBlock_withRecon (model_module.py:220-316), num_repeats=1."""

    def __init__(self, w: W, prefix, in_ch, out_ch, downsample=False,
                 recon=True, use_se=True, mid_squeeze=2):
        super().__init__()
        stride = 2 if downsample else 1
        mid = max(out_ch // mid_squeeze, 1)
        self.has_skip = stride > 1 or in_ch != out_ch
        idx = 0
        if self.has_skip:
            self.skip_conv = w.conv(in_ch, out_ch, 1, f"{prefix}/skip_conv",
                                    stride=stride, bias=False)
            self.skip_bn = w.bn(out_ch, f"{prefix}/BatchNorm_0")
            idx = 1
        self.conv1 = w.conv(in_ch, mid, 1, f"{prefix}/Conv_0", stride=stride,
                            bias=False)
        self.bn1 = w.bn(mid, f"{prefix}/BatchNorm_{idx}")
        self.conv2 = w.conv(mid, mid, 3, f"{prefix}/Conv_1", padding=1,
                            bias=False)
        self.bn2 = w.bn(mid, f"{prefix}/BatchNorm_{idx + 1}")
        self.conv3 = w.conv(mid, out_ch, 1, f"{prefix}/Conv_2", bias=False)
        self.bn3 = w.bn(out_ch, f"{prefix}/BatchNorm_{idx + 2}")
        self.se = TSE(w, f"{prefix}/se", out_ch) if use_se else None
        self.recon = None
        if recon:
            self.rc1 = w.conv(out_ch, out_ch, 3, f"{prefix}/reconstruct/Conv_0",
                              padding=1, bias=False)
            self.rbn = w.bn(out_ch, f"{prefix}/reconstruct/BatchNorm_0")
            self.rc2 = w.conv(out_ch, 1, 3, f"{prefix}/reconstruct/Conv_1",
                              padding=1)
            self.recon = True

    def forward(self, x):
        idn = self.skip_bn(self.skip_conv(x)) if self.has_skip else x
        h = TF.gelu(self.bn1(self.conv1(x)))
        h = TF.gelu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        out = TF.gelu(h + idn)
        if self.se is not None:
            out, _ = self.se(out)
        r = self.rc2(TF.gelu(self.rbn(self.rc1(out)))) if self.recon else None
        return out, r


class TAlign(tnn.Module):
    """FeatureDownAlign, no downsample (model_module.py:371-396)."""

    def __init__(self, w: W, prefix, in_ch, out_ch):
        super().__init__()
        self.conv = w.conv(in_ch, out_ch, 1, f"{prefix}/Conv_0", bias=False)
        self.bn = w.bn(out_ch, f"{prefix}/BatchNorm_0")

    def forward(self, x):
        return TF.gelu(self.bn(self.conv(x)))


class TMaskHead(tnn.Module):
    """MaskHeadResize on a 16^2 input -> bilinear to 32 (model_module.py:131-215)."""

    def __init__(self, w: W, prefix, in_ch, mid=64, out_size=32):
        super().__init__()
        self.pre = w.conv(in_ch, mid, 1, f"{prefix}/Conv_0")
        self.out = w.conv(mid, 1, 1, f"{prefix}/Conv_1")
        self.out_size = out_size

    def forward(self, x):
        h = self.pre(x)
        if h.shape[-1] != self.out_size:
            h = TF.interpolate(h, size=(self.out_size, self.out_size),
                               mode="bilinear", align_corners=False)
        return self.out(h)


class TSpatialAttn(tnn.Module):
    """MaskGuidedSpatialAttention (model_module.py:49-97)."""

    def __init__(self, w: W, prefix, hidden=16):
        super().__init__()
        self.gamma = tnn.Parameter(w.scalar(f"{prefix}/gamma"))
        self.a1 = w.conv(1, hidden, 1, f"{prefix}/Conv_0", bias=False)
        self.gn = w.groupnorm(1, hidden, f"{prefix}/GroupNorm_0")
        self.a2 = w.conv(hidden, 1, 1, f"{prefix}/Conv_1")

    def forward(self, f, mask):
        if mask.shape[-2:] != f.shape[-2:]:
            mask = TF.interpolate(mask, size=f.shape[-2:], mode="bilinear",
                                  align_corners=False)
        a = torch.sigmoid(self.a2(TF.gelu(self.gn(self.a1(mask)))))
        a = torch.clamp(a, 1e-4, 1.0 - 1e-4)
        return f * (1.0 + self.gamma * a), a


class TProjector(tnn.Module):
    """Projector (model_module.py:323-348)."""

    def __init__(self, w: W, prefix, in_ch, pd):
        super().__init__()
        self.c1 = w.conv(in_ch, pd, 1, f"{prefix}/Conv_0", bias=False)
        self.b1 = w.bn(pd, f"{prefix}/BatchNorm_0")
        self.c2 = w.conv(pd, pd, 1, f"{prefix}/Conv_1", bias=False)
        self.b2 = w.bn(pd, f"{prefix}/BatchNorm_1")

    def forward(self, x):
        x = TF.gelu(self.b1(self.c1(x)))
        return TF.gelu(self.b2(self.c2(x)))


class TorchEncoder(tnn.Module):
    """ModelMaskHeadBackbone, use_backbone=False, mask_stage='f2'
    (model_module.py:481-733)."""

    def __init__(self, w: W):
        super().__init__()
        self.modality_attention = TSE(w, "modality_attention", C_IN)
        self.block1 = TResLite(w, "block1", C_IN, C1, downsample=True)
        self.block2 = TResLite(w, "block2", C1, C2)
        self.f1_to_f2 = TAlign(w, "f1_to_f2", C1, C2)
        self.mask_head = TMaskHead(w, "mask_head", C2)
        self.spatial = TSpatialAttn(w, "mask_spatial_attention")
        self.block3 = TResLite(w, "block3", C2, C3, recon=False)
        self.proj_f1 = TProjector(w, "proj_f1", C1, PD)
        self.proj_f2 = TProjector(w, "proj_f2", C2, PD)
        self.proj_r1 = TProjector(w, "proj_r1", 1, PD)
        self.proj_r2 = TProjector(w, "proj_r2", 1, PD)
        self.classification_head = w.dense(
            C3, NUM_CLASSES, "classification_head/Dense_0")

    def forward(self, x):
        x_in, mod_w = self.modality_attention(x)
        f1, r1 = self.block1(x_in)
        f2, r2 = self.block2(f1)
        mask_pred = self.mask_head(f2 + self.f1_to_f2(f1))
        f2, attn_map = self.spatial(f2, mask_pred)
        f3, _ = self.block3(f2)

        p1 = self.proj_f1(TF.adaptive_avg_pool2d(f1, PD))
        p2 = self.proj_f2(TF.adaptive_avg_pool2d(f2, PD))
        p1_r = self.proj_r1(TF.adaptive_avg_pool2d(r1, PD))
        p2_r = self.proj_r2(TF.adaptive_avg_pool2d(r2, PD))

        pooled = TF.adaptive_avg_pool2d(f3, 1).flatten(1)
        logits = self.classification_head(TF.normalize(pooled, dim=1))
        aux = {
            "raw_feats": [f1, f2, f3],
            "recon_feats": [r1, r2],
            "proj_pairs": [p1, p1_r, p2, p2_r],
            "mask_attn_map": attn_map,
            "mod_attn_map": mod_w,
        }
        return logits, aux, mask_pred


# ---------------------------------------------------------------------------
# torch mirror of the composite single-model loss (train.py:294-428)
# ---------------------------------------------------------------------------


def t_label_smoothing(labels, num_classes, alpha):
    one = TF.one_hot(labels, num_classes).float()
    return one * (1 - alpha) + (1 - one) * alpha / (num_classes - 1)


def t_soft_weighted_focal(logits, targets, gamma, class_weights):
    logp = TF.log_softmax(logits, dim=-1)
    p = logp.exp()
    focal = (1 - p) ** gamma
    if class_weights is not None:
        focal = focal * class_weights.reshape(1, -1)
    return -(targets * focal * logp).sum(-1).mean()


def t_soft_dice(logits, targets, eps=1e-6):
    p = torch.sigmoid(logits)
    dims = tuple(range(1, p.ndim))
    inter = (p * targets).sum(dims)
    union = p.sum(dims) + targets.sum(dims)
    return 1.0 - ((2 * inter + eps) / (union + eps)).mean()


def t_recon_image_loss(pred_logits, target, eps=1e-3):
    pred = torch.clamp(torch.sigmoid(pred_logits), 0, 1)
    target = torch.clamp(target, 0, 1)
    return torch.sqrt((pred - target) ** 2 + eps**2).mean()


def t_single_recon(recon_feats, inputs):
    total = torch.zeros(())
    for r in recon_feats:
        up = TF.interpolate(r, size=inputs.shape[-2:], mode="bilinear",
                            align_corners=False)
        tgt = inputs.mean(dim=1, keepdim=True) if up.shape[1] == 1 and \
            inputs.shape[1] > 1 else inputs
        total = total + t_recon_image_loss(up, tgt)
    return total


def t_mimic(s, t, eps=1e-6):
    t = t.detach()
    s = TF.normalize(s.flatten(1), dim=1, eps=1e-12)
    t = TF.normalize(t.flatten(1), dim=1, eps=1e-12)
    cos = (s * t).sum(1)
    return (1.0 - torch.clamp(cos, -1 + eps, 1 - eps)).mean()


def t_composite_loss(mc_cfg, logits, aux, mask_pred, x, masks, labels, aux_w,
                     class_weights):
    """Reference train-mode loss with the double lambda*aux_w application
    (train.py:397-400 + 462-464)."""
    terms = {}
    targets = t_label_smoothing(labels, NUM_CLASSES,
                                mc_cfg.label_smoothing_alpha)
    terms["clf_loss"] = t_soft_weighted_focal(
        logits, targets, mc_cfg.classification_loss.gamma, class_weights)
    loss = terms["clf_loss"]

    feat_n = sum(torch.mean(f**2) for f in aux["raw_feats"])
    terms["feat_norm_loss"] = feat_n
    loss = loss + feat_n * mc_cfg.lambda_feat_norm

    terms["mask_loss"] = t_soft_dice(mask_pred, masks)
    loss = loss + mc_cfg.mask.lambda_mask * terms["mask_loss"]

    recon_raw = t_single_recon(aux["recon_feats"], x)
    p1, p1_r, p2, p2_r = aux["proj_pairs"]
    mimic_raw = t_mimic(p1, p1_r) + t_mimic(p2, p2_r)
    recon_metric = mc_cfg.lambda_recon * recon_raw * aux_w
    mimic_metric = mc_cfg.lambda_mimic * mimic_raw * aux_w
    terms["recon_loss"] = recon_metric
    terms["mimic_loss"] = mimic_metric
    loss = loss + (mc_cfg.lambda_recon * recon_metric * aux_w
                   + mc_cfg.lambda_mimic * mimic_metric * aux_w)
    terms["loss"] = loss
    return loss, terms


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def t_in(x):
    return torch.tensor(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


@pytest.fixture(scope="module")
def encoder_setup(rng_module):
    rng = rng_module
    cfg = parity_cfg()
    model = Encoder(method="dwi", config=cfg.dwi_model, channel_num=C_IN,
                    num_classes=NUM_CLASSES)
    x = jnp.asarray(rng.rand(B, S, S, C_IN).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    # non-trivial BN running stats
    stats = jax.tree.map(
        lambda v: jnp.asarray(
            0.5 + 0.5 * np.random.RandomState(11).rand(*v.shape)
        ).astype(jnp.float32),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    torch_enc = TorchEncoder(W(variables))
    masks = (rng.rand(B, 32, 32, 1) > 0.7).astype(np.float32)
    labels = (np.arange(B) % NUM_CLASSES).astype(np.int32)
    return cfg, model, variables, torch_enc, x, masks, labels


@pytest.fixture(scope="module")
def rng_module():
    return np.random.RandomState(42)


def assert_close(ours, ref, name, rtol=2e-4, atol=1e-6):
    """Max-norm relative check with an absolute floor: differences below
    ``atol`` are fp32 accumulation noise regardless of the tensor's scale
    (e.g. pre-sigmoid mask logits ~2e-3 make the relative metric explode)."""
    ours = np.asarray(ours)
    ref = ref.detach().numpy() if torch.is_tensor(ref) else np.asarray(ref)
    if ref.ndim == 4:  # NCHW -> NHWC
        ref = ref.transpose(0, 2, 3, 1)
    err = np.abs(ours - ref).max()
    denom = np.abs(ref).max() + 1e-8
    rel = err / denom
    assert rel < rtol or err < atol, (name, rel, err, denom)


class TestEncoderForwardParity:
    def test_eval_forward(self, encoder_setup):
        cfg, model, variables, torch_enc, x, masks, labels = encoder_setup
        logits, aux, mask_pred = model.apply(variables, x, train=False)
        torch_enc.eval()
        with torch.no_grad():
            t_logits, t_aux, t_mask = torch_enc(t_in(x))
        assert_close(logits, t_logits, "logits", 1e-5)
        assert_close(mask_pred, t_mask, "mask_pred", 1e-5)
        for i in range(3):
            assert_close(aux["raw_feats"][i], t_aux["raw_feats"][i],
                         f"f{i + 1}", 1e-5)
        for i in range(2):
            assert_close(aux["recon_feats"][i], t_aux["recon_feats"][i],
                         f"r{i + 1}", 1e-5)
        for i in range(4):
            assert_close(aux["proj_pairs"][i], t_aux["proj_pairs"][i],
                         f"proj{i}", 1e-5)
        assert_close(aux["mask_attn_map"], t_aux["mask_attn_map"],
                     "attn_map", 1e-5)

    def test_train_forward_and_bn_updates(self, encoder_setup):
        """Train-mode BN: normalization by batch stats AND the running-stat
        update (torch's unbiased running_var) must both match."""
        cfg, model, variables, torch_enc, x, masks, labels = encoder_setup
        (logits, aux, mask_pred), mutated = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        torch_enc = TorchEncoder(W(variables))  # fresh running stats
        torch_enc.train()
        t_logits, t_aux, t_mask = torch_enc(t_in(x))
        assert_close(logits, t_logits, "train logits", 2e-5)
        assert_close(mask_pred, t_mask, "train mask", 2e-5)

        # running stats after one train-mode forward
        new_stats = mutated["batch_stats"]
        for blk, tblk in [("block1", torch_enc.block1),
                          ("block2", torch_enc.block2)]:
            ours_mean = np.asarray(
                _get(new_stats, f"{blk}/BatchNorm_1/BatchNorm_0")["mean"])
            ours_var = np.asarray(
                _get(new_stats, f"{blk}/BatchNorm_1/BatchNorm_0")["var"])
            np.testing.assert_allclose(
                ours_mean, tblk.bn1.running_mean.detach().numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"{blk} running_mean")
            np.testing.assert_allclose(
                ours_var, tblk.bn1.running_var.detach().numpy(),
                rtol=1e-4, atol=1e-6, err_msg=f"{blk} running_var (unbiased)")


class TestCompositeLossParity:
    def test_every_term_matches(self, encoder_setup):
        from dmf_tpu.losses import compute_class_weights
        from dmf_tpu.losses.classification import soft_weighted_focal_loss
        from dmf_tpu.losses.mask import soft_dice_loss
        from dmf_tpu.train.single import compute_single_losses

        cfg, model, variables, torch_enc, x, masks, labels = encoder_setup
        aux_w = 0.7
        weights = compute_class_weights(jnp.asarray(labels), NUM_CLASSES)
        clf = lambda lo, t: soft_weighted_focal_loss(
            lo, t, cfg.dwi_model.classification_loss.gamma, weights)

        (logits, aux, mask_pred), _ = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        loss, metrics = compute_single_losses(
            cfg, "dwi", clf, soft_dice_loss, logits, aux, mask_pred,
            x, jnp.asarray(masks), jnp.asarray(labels),
            jnp.asarray(aux_w, jnp.float32), is_train=True,
        )

        torch_enc.train()
        t_logits, t_aux, t_mask = torch_enc(t_in(x))
        t_weights = torch.tensor(np.asarray(weights))
        t_loss, t_terms = t_composite_loss(
            cfg.dwi_model, t_logits, t_aux, t_mask, t_in(x),
            t_in(masks), torch.tensor(labels, dtype=torch.long),
            aux_w, t_weights,
        )
        for k in ("clf_loss", "feat_norm_loss", "mask_loss", "recon_loss",
                  "mimic_loss", "loss"):
            np.testing.assert_allclose(
                float(metrics[k]), float(t_terms[k]), rtol=2e-4,
                err_msg=k,
            )


class TestTrainStepParity:
    def test_one_adamw_step(self, encoder_setup):
        """One full optimizer step: grouped discriminative-LR AdamW with the
        classification head excluded, against torch.optim.AdamW."""
        from dmf_tpu.losses import compute_class_weights
        from dmf_tpu.losses.classification import soft_weighted_focal_loss
        from dmf_tpu.losses.mask import soft_dice_loss
        from dmf_tpu.train.optim import discriminative_hparams

        cfg, model, variables, torch_enc, x, masks, labels = encoder_setup
        weights = compute_class_weights(jnp.asarray(labels), NUM_CLASSES)
        clf = lambda lo, t: soft_weighted_focal_loss(
            lo, t, cfg.dwi_model.classification_loss.gamma, weights)
        state = TrainState.create(variables)
        spec = build_group_spec(state.params, False, True)
        step = make_single_train_step(cfg, "dwi", model, clf, soft_dice_loss,
                                      spec, donate=False)
        hp = SingleModelOptController(cfg, "dwi").hyperparams()
        batch = {
            "imgs": x, "masks": jnp.asarray(masks),
            "labels": jnp.asarray(labels),
            "aux_w": jnp.asarray(0.7, jnp.float32),
        }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(2), hp)

        # ---- torch side ----
        torch_enc = TorchEncoder(W(variables))
        torch_enc.train()
        lrs, wds = discriminative_hparams(cfg.dwi_model.optimizer, 3)
        groups = {0: [], 1: [], 2: []}
        for name, p in torch_enc.named_parameters():
            if "classification_head" in name:
                continue
            if "block1" in name:
                groups[0].append(p)
            elif "block2" in name:
                groups[1].append(p)
            else:
                groups[2].append(p)
        opt = torch.optim.AdamW(
            [{"params": groups[g], "lr": lrs[g], "weight_decay": wds[g]}
             for g in range(3)],
            betas=(0.9, 0.999), eps=1e-8,
        )
        t_logits, t_aux, t_mask = torch_enc(t_in(x))
        t_weights = torch.tensor(np.asarray(weights))
        t_loss, _ = t_composite_loss(
            cfg.dwi_model, t_logits, t_aux, t_mask, t_in(x), t_in(masks),
            torch.tensor(labels, dtype=torch.long), 0.7, t_weights,
        )
        opt.zero_grad()
        t_loss.backward()
        opt.step()

        # compare updated params for each group and the frozen head
        def flax_leaf(path):
            return np.asarray(_get(new_state.params, path))

        comparisons = [
            ("block1/Conv_0/kernel", torch_enc.block1.conv1.weight, "conv"),
            ("block1/se/Dense_0/kernel", torch_enc.block1.se.fc1.weight, "dense"),
            ("block2/Conv_1/kernel", torch_enc.block2.conv2.weight, "conv"),
            ("block3/Conv_2/kernel", torch_enc.block3.conv3.weight, "conv"),
            ("mask_head/Conv_0/kernel", torch_enc.mask_head.pre.weight, "conv"),
            ("mask_spatial_attention/gamma", torch_enc.spatial.gamma, "scalar"),
            ("proj_f1/Conv_0/kernel", torch_enc.proj_f1.c1.weight, "conv"),
            ("modality_attention/Dense_0/kernel",
             torch_enc.modality_attention.fc1.weight, "dense"),
            ("block1/BatchNorm_1/BatchNorm_0/scale",
             torch_enc.block1.bn1.weight, "vec"),
        ]
        for path, t_p, kind in comparisons:
            ours = flax_leaf(path)
            ref = t_p.detach().numpy()
            if kind == "conv":
                ref = ref.transpose(2, 3, 1, 0)
            elif kind == "dense":
                ref = ref.T
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-6,
                                       err_msg=path)

        # classification head must be untouched on BOTH sides (compat quirk)
        np.testing.assert_array_equal(
            flax_leaf("classification_head/Dense_0/kernel"),
            np.asarray(_get(state.params, "classification_head/Dense_0/kernel")),
        )


# ---------------------------------------------------------------------------
# fusion model + composite fusion loss
# ---------------------------------------------------------------------------


class TorchCrossAttention(tnn.Module):
    """Our CrossAttentionBlock decomposition (q/k/v/out linears + LN-MLP FFN,
    model_module.py:799-818 semantics)."""

    def __init__(self, w: W, prefix, ch, heads):
        super().__init__()
        self.ch, self.heads = ch, heads
        self.q = w.dense(ch, ch, f"{prefix}/q_proj")
        self.k = w.dense(ch, ch, f"{prefix}/k_proj")
        self.v = w.dense(ch, ch, f"{prefix}/v_proj")
        self.o = w.dense(ch, ch, f"{prefix}/out_proj")
        ln = _get(w.p, f"{prefix}/LayerNorm_0")
        self.ln = tnn.LayerNorm(ch, eps=1e-5)
        self.ln.weight.data = torch.tensor(np.asarray(ln["scale"]))
        self.ln.bias.data = torch.tensor(np.asarray(ln["bias"]))
        self.f1 = w.dense(ch, ch, f"{prefix}/Dense_0")
        self.f2 = w.dense(ch, ch, f"{prefix}/Dense_1")

    def forward(self, q_tok, kv_tok):
        Bt, Nq, C = q_tok.shape
        Nk = kv_tok.shape[1]
        D = C // self.heads

        def split(t, n):
            return t.reshape(Bt, n, self.heads, D).permute(0, 2, 1, 3)

        q = split(self.q(q_tok), Nq)
        k = split(self.k(kv_tok), Nk)
        v = split(self.v(kv_tok), Nk)
        wts = ((q @ k.transpose(-2, -1)) / math.sqrt(D)).softmax(-1)
        out = (wts @ v).permute(0, 2, 1, 3).reshape(Bt, Nq, C)
        out = self.o(out)
        ffn = self.f2(TF.gelu(self.f1(self.ln(out))))
        return out + ffn, wts.mean(1)


class TorchFusion(tnn.Module):
    """FusionModel (model_module.py:919-1000)."""

    def __init__(self, w: W, fc=16, pd=PD, heads=4):
        super().__init__()
        self.fc = fc
        self.proj_in_dwi = w.conv(C3, fc, 1, "proj_in_dwi", bias=False)
        self.proj_in_dce = w.conv(C3, fc, 1, "proj_in_dce", bias=False)
        self.reduce_conv = w.conv(2 * fc, fc, 1, "fusion_conv_reduce/Conv_0",
                                  bias=False)
        self.reduce_bn = w.bn(fc, "fusion_conv_reduce/BatchNorm_0")
        self.refine = TResLite(w, "refine", fc, fc, use_se=False)
        self.gating = w.dense(2 * fc + 2, 2, "gating/fc")
        self.cross = TorchCrossAttention(w, "cross_attn_block", fc, heads)
        self.fusion_se = TSE(w, "fusion_se", fc)
        self.mask_head = TMaskHead(w, "mask_head", fc)
        self.classifier = w.dense(fc, NUM_CLASSES, "classifier")
        self.rc1 = w.conv(fc, fc, 3, "fusion_reconstruct/Conv_0", padding=1,
                          bias=False)
        self.rbn = w.bn(fc, "fusion_reconstruct/BatchNorm_0")
        self.rc2 = w.conv(fc, 1, 3, "fusion_reconstruct/Conv_1", padding=1)
        self.projF = TProjector(w, "projF", fc, pd)

    def forward(self, f3_dwi, f3_dce, dwi_mask, dce_mask):
        p_dwi = self.proj_in_dwi(f3_dwi)
        p_dce = self.proj_in_dce(f3_dce)
        cat = torch.cat([p_dwi, p_dce], dim=1)
        reduced = TF.gelu(self.reduce_bn(self.reduce_conv(cat)))
        residual, _ = self.refine(reduced)
        _refined = TF.gelu(reduced + residual)  # computed, unused (ref quirk)

        pvec_dwi = TF.adaptive_avg_pool2d(p_dwi, 1).flatten(1)
        pvec_dce = TF.adaptive_avg_pool2d(p_dce, 1).flatten(1)
        dwi_conf = dwi_mask.mean(dim=(-2, -1)).flatten(1)
        dce_conf = dce_mask.mean(dim=(-2, -1)).flatten(1)
        gating = self.gating(
            torch.cat([pvec_dwi, pvec_dce, dwi_conf, dce_conf], dim=1)
        ).softmax(1)
        fused = (gating[:, 0].view(-1, 1, 1, 1) * p_dwi
                 + gating[:, 1].view(-1, 1, 1, 1) * p_dce)

        t_dwi = TF.adaptive_avg_pool2d(p_dwi, 4).flatten(2).transpose(1, 2)
        t_dce = TF.adaptive_avg_pool2d(p_dce, 4).flatten(2).transpose(1, 2)
        attn_out, attn_w = self.cross(t_dwi, t_dce)
        lowres = attn_out.transpose(1, 2).reshape(-1, self.fc, 4, 4)
        up = TF.interpolate(lowres, size=fused.shape[-2:], mode="bilinear",
                            align_corners=False)
        fused = fused + up

        fused_refined, _ = self.fusion_se(fused)
        fused_mask = self.mask_head(fused_refined)
        pooled = TF.adaptive_avg_pool2d(fused_refined, 1).flatten(1)
        logits = self.classifier(pooled)
        recon = self.rc2(TF.gelu(self.rbn(self.rc1(fused_refined))))
        proj = self.projF(fused_refined)
        aux = {"proj_fused": proj, "recon_fused": recon,
               "gating_weights": gating, "attn_weights": attn_w,
               "p_dwi": p_dwi, "p_dce": p_dce}
        return logits, fused_mask, aux


@pytest.fixture(scope="module")
def fusion_setup(rng_module):
    rng = rng_module
    cfg = parity_cfg()
    fusion = FusionModel(config=cfg.fusion_model, num_classes=NUM_CLASSES)
    f3_dwi = jnp.asarray(rng.rand(B, 16, 16, C3).astype(np.float32))
    f3_dce = jnp.asarray(rng.rand(B, 16, 16, C3).astype(np.float32))
    dwi_mask = jnp.asarray(rng.rand(B, 32, 32, 1).astype(np.float32))
    dce_mask = jnp.asarray(rng.rand(B, 32, 32, 1).astype(np.float32))
    raw_dwi = [None, None, f3_dwi]
    raw_dce = [None, None, f3_dce]
    variables = fusion.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        raw_dwi, raw_dce, dwi_mask, dce_mask, train=False,
    )
    stats = jax.tree.map(
        lambda v: jnp.asarray(
            0.5 + 0.5 * np.random.RandomState(13).rand(*v.shape)
        ).astype(jnp.float32),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return (cfg, fusion, variables, TorchFusion(W(variables)),
            f3_dwi, f3_dce, dwi_mask, dce_mask)


class TestFusionForwardParity:
    def test_eval_forward(self, fusion_setup):
        (cfg, fusion, variables, torch_f, f3_dwi, f3_dce,
         dwi_mask, dce_mask) = fusion_setup
        logits, fused_mask, aux = fusion.apply(
            variables, [None, None, f3_dwi], [None, None, f3_dce],
            dwi_mask, dce_mask, train=False,
        )
        torch_f.eval()
        with torch.no_grad():
            t_logits, t_mask, t_aux = torch_f(
                t_in(f3_dwi), t_in(f3_dce), t_in(dwi_mask), t_in(dce_mask))
        assert_close(logits, t_logits, "fusion logits", 1e-5)
        assert_close(fused_mask, t_mask, "fused mask", 1e-5)
        assert_close(aux["gating_weights"], t_aux["gating_weights"],
                     "gating", 1e-5)
        assert_close(aux["proj_fused"], t_aux["proj_fused"], "projF", 1e-5)
        assert_close(aux["recon_fused"], t_aux["recon_fused"], "recon", 1e-5)
        np.testing.assert_allclose(
            np.asarray(aux["attn_weights"]),
            t_aux["attn_weights"].numpy(), rtol=1e-4, atol=1e-6)

    def test_fusion_composite_loss(self, fusion_setup):
        """compute_fusion_losses vs the reference's composite
        (train_fusion.py:239-296): 3-way mask mean, 3-way recon mean, the
        sample-pair 'fused mimic' quirk."""
        from dmf_tpu.losses import compute_class_weights
        from dmf_tpu.losses.classification import soft_weighted_focal_loss
        from dmf_tpu.losses.mask import soft_dice_loss
        from dmf_tpu.train.fusion import compute_fusion_losses

        (cfg, fusion, variables, torch_f, f3_dwi, f3_dce,
         dwi_mask, dce_mask) = fusion_setup
        rng = np.random.RandomState(5)
        masks = jnp.asarray((rng.rand(B, 32, 32, 1) > 0.7).astype(np.float32))
        labels = (np.arange(B) % NUM_CLASSES).astype(np.int32)
        dwi_x = jnp.asarray(rng.rand(B, S, S, C_IN).astype(np.float32))
        dce_x = jnp.asarray(rng.rand(B, S, S, 6).astype(np.float32))
        aux_w = 0.6
        weights = compute_class_weights(jnp.asarray(labels), NUM_CLASSES)
        clf = lambda lo, t: soft_weighted_focal_loss(lo, t, 1.5, weights)

        (logits, fused_mask, aux), _ = fusion.apply(
            variables, [None, None, f3_dwi], [None, None, f3_dce],
            dwi_mask, dce_mask, train=True,
            rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
        )
        # encoder parts stubbed with fixed tensors (encoders already proven)
        r1 = jnp.asarray(rng.rand(B, 16, 16, 1).astype(np.float32))
        r2 = jnp.asarray(rng.rand(B, 16, 16, 1).astype(np.float32))
        parts = {
            "dwi_aux": {"recon_feats": [r1, r2]},
            "dce_aux": {"recon_feats": [r1 * 0.5, r2 * 0.5]},
            "dwi_mask": dwi_mask, "dce_mask": dce_mask,
        }
        loss, metrics = compute_fusion_losses(
            cfg, clf, soft_dice_loss, logits, fused_mask, aux, parts,
            dwi_x, dce_x, masks, jnp.asarray(labels),
            jnp.asarray(aux_w, jnp.float32), is_train=True,
        )

        # torch mirror (train_fusion.py:239-296)
        torch_f.train()
        t_logits, t_mask, t_aux = torch_f(
            t_in(f3_dwi), t_in(f3_dce), t_in(dwi_mask), t_in(dce_mask))
        fp = cfg.fusion_model
        targets = t_label_smoothing(torch.tensor(labels, dtype=torch.long),
                                    NUM_CLASSES, fp.label_smoothing_alpha)
        t_weights = torch.tensor(np.asarray(weights))
        t_clf = t_soft_weighted_focal(t_logits, targets, 1.5, t_weights)
        t_masks = t_in(masks)
        t_mask_l = (t_soft_dice(t_in(dwi_mask), t_masks)
                    + t_soft_dice(t_in(dce_mask), t_masks)
                    + t_soft_dice(t_mask, t_masks)) / 3.0

        def t_recon_list(recons, img):
            tot = torch.zeros(())
            for r in recons:
                r_up = TF.interpolate(r, size=img.shape[-2:], mode="bilinear",
                                      align_corners=False)
                if r_up.shape[1] != img.shape[1]:
                    r_up = r_up.mean(1, keepdim=True)
                    tgt = img.mean(1, keepdim=True)
                else:
                    tgt = img
                tot = tot + t_recon_image_loss(r_up, tgt)
            return tot / len(recons)

        t_dwi_x, t_dce_x = t_in(dwi_x), t_in(dce_x)
        fused_in = torch.cat([t_dwi_x, t_dce_x], dim=1)
        t_recon = (
            t_recon_list([t_in(r1), t_in(r2)], t_dwi_x)
            + t_recon_list([t_in(r1 * 0.5), t_in(r2 * 0.5)], t_dce_x)
            + t_recon_list([t_aux["recon_fused"]], fused_in)
        ) / 3.0
        # fused 'mimic': sample pairs (0,1), (2,3) of proj_fused
        # (train_fusion.py:291-296), channels flattened NCHW-style
        pf = t_aux["proj_fused"]
        t_mimic_v = (t_mimic(pf[0], pf[1]) + t_mimic(pf[2], pf[3])) / 2.0
        t_total = (t_clf + fp.mask.lambda_mask * t_mask_l
                   + fp.lambda_recon * t_recon * aux_w
                   + fp.lambda_mimic * t_mimic_v * aux_w)

        np.testing.assert_allclose(float(metrics["clf_loss"]), float(t_clf),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(metrics["mask_loss"]),
                                   float(t_mask_l), rtol=2e-4)
        np.testing.assert_allclose(float(metrics["recon_loss"]),
                                   float(t_recon), rtol=2e-4)
        np.testing.assert_allclose(float(metrics["mimic_loss"]),
                                   float(t_mimic_v), rtol=2e-4)
        np.testing.assert_allclose(float(loss), float(t_total), rtol=2e-4)

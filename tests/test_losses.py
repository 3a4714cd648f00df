"""Loss parity tests: dmf_tpu losses vs the reference formulas.

torch (CPU) is used as an independent oracle implementing the reference's
exact loss math (loss.py, train.py:991-1048) — no reference code is imported.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from dmf_tpu import losses as L


def t(x):
    return torch.tensor(np.asarray(x))


class TestSoftDice:
    def test_matches_reference_formula(self, rng):
        logits = rng.randn(4, 16, 16, 1).astype(np.float32)
        targets = (rng.rand(4, 16, 16, 1) > 0.7).astype(np.float32)
        ours = float(L.soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
        # torch oracle (loss.py:45-62), NCHW
        pl = t(logits).permute(0, 3, 1, 2)
        tg = t(targets).permute(0, 3, 1, 2)
        probs = torch.sigmoid(pl)
        dims = (2, 3)
        inter = (probs * tg).sum(dims)
        union = probs.sum(dims) + tg.sum(dims)
        dice = (2 * inter + 1e-6) / (union + 1e-6)
        ref = float((1 - dice.mean()))
        assert abs(ours - ref) < 1e-4


class TestDiceBCE:
    def test_matches_reference_formula(self, rng):
        logits = rng.randn(3, 8, 8, 1).astype(np.float32)
        targets = (rng.rand(3, 8, 8, 1) > 0.5).astype(np.float32)
        ours = float(L.dice_bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
        pl = t(logits).permute(0, 3, 1, 2)
        tg = t(targets).permute(0, 3, 1, 2)
        bce = TF.binary_cross_entropy_with_logits(pl, tg)
        probs = torch.sigmoid(pl)
        pf = probs.reshape(3, -1)
        tf_ = tg.reshape(3, -1)
        inter = (pf * tf_).sum(1)
        denom = pf.sum(1) + tf_.sum(1) + 1e-6
        ref = float(bce + (1 - (2 * inter / denom).mean()))
        assert abs(ours - ref) < 1e-4


class TestFocalFamily:
    def test_soft_weighted_focal(self, rng):
        logits = rng.randn(16, 4).astype(np.float32)
        labels = rng.randint(0, 4, 16)
        w = np.array([0.5, 1.0, 2.0, 4.0], np.float32)
        gamma = 1.5
        ours = float(
            L.soft_weighted_focal_loss(
                jnp.asarray(logits), jnp.asarray(labels), gamma, jnp.asarray(w)
            )
        )
        # oracle (loss.py:157-187)
        lp = TF.log_softmax(t(logits), dim=1)
        probs = lp.exp()
        fw = (1 - probs) ** gamma * t(w).view(1, -1)
        onehot = TF.one_hot(t(labels).long(), 4).float()
        ref = float((-(onehot * fw * lp).sum(1)).mean())
        assert abs(ours - ref) < 1e-4

    def test_soft_weighted_focal_with_smoothed_targets(self, rng):
        logits = rng.randn(8, 4).astype(np.float32)
        labels = rng.randint(0, 4, 8)
        smoothed = L.label_smoothing(jnp.asarray(labels), 4, 0.1)
        w = np.ones(4, np.float32)
        ours = float(
            L.soft_weighted_focal_loss(jnp.asarray(logits), smoothed, 1.5, jnp.asarray(w))
        )
        lp = TF.log_softmax(t(logits), dim=1)
        probs = lp.exp()
        fw = (1 - probs) ** 1.5
        # reference LabelSmoothing (loss.py:190-213)
        true_dist = torch.full((8, 4), 0.1 / 3)
        true_dist.scatter_(1, t(labels).long().unsqueeze(1), 0.9)
        ref = float((-(true_dist * fw * lp).sum(1)).mean())
        assert abs(ours - ref) < 1e-4

    def test_soft_focal(self, rng):
        logits = rng.randn(8, 4).astype(np.float32)
        labels = rng.randint(0, 4, 8)
        ours = float(L.soft_focal_loss(jnp.asarray(logits), jnp.asarray(labels), 2.0))
        lp = TF.log_softmax(t(logits), dim=1)
        probs = lp.exp()
        onehot = TF.one_hot(t(labels).long(), 4).float()
        ref = float((-(onehot * (1 - probs) ** 2 * lp).sum(1)).mean())
        assert abs(ours - ref) < 1e-4

    def test_focal_hard(self, rng):
        logits = rng.randn(8, 4).astype(np.float32)
        labels = rng.randint(0, 4, 8)
        ours = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), 1.0, 2.0))
        ce = TF.cross_entropy(t(logits), t(labels).long(), reduction="none")
        pt = torch.exp(-ce)
        ref = float((1.0 * (1 - pt) ** 2 * ce).mean())
        assert abs(ours - ref) < 1e-4


class TestLabelSmoothing:
    def test_distribution(self):
        labels = jnp.asarray([0, 2])
        dist = np.asarray(L.label_smoothing(labels, 4, 0.1))
        assert np.allclose(dist[0], [0.9, 0.1 / 3, 0.1 / 3, 0.1 / 3], atol=1e-7)
        assert np.allclose(dist.sum(axis=1), 1.0, atol=1e-6)


class TestClassWeights:
    def test_inverse_frequency(self):
        labels = jnp.asarray([0, 0, 0, 1, 2, 2, 3, 3, 3, 3])
        w = np.asarray(L.compute_class_weights(labels, 4))
        counts = np.array([3, 1, 2, 4], np.float32)
        ref = 10.0 / (4 * (counts + 1e-6))
        assert np.allclose(w, ref, rtol=1e-5)


class TestAuxLosses:
    def test_charbonnier_and_recon(self, rng):
        pred = rng.randn(2, 8, 8, 1).astype(np.float32)
        targ = rng.rand(2, 8, 8, 1).astype(np.float32)
        ours = float(L.recon_image_loss(jnp.asarray(pred), jnp.asarray(targ)))
        p = torch.sigmoid(t(pred)).clamp(0, 1)
        g = t(targ).clamp(0, 1)
        ref = float(torch.mean(torch.sqrt((p - g) ** 2 + 1e-3**2)))
        assert abs(ours - ref) < 1e-5

    def test_mimic_feat_loss(self, rng):
        a = rng.randn(4, 8, 8, 16).astype(np.float32)
        b = rng.randn(4, 8, 8, 16).astype(np.float32)
        ours = float(L.mimic_feat_loss(jnp.asarray(a), jnp.asarray(b)))
        s = TF.normalize(t(a).reshape(4, -1), dim=1)
        tt = TF.normalize(t(b).reshape(4, -1), dim=1)
        cos = (s * tt).sum(1)
        ref = float((1 - cos.clamp(-1 + 1e-6, 1 - 1e-6)).mean())
        assert abs(ours - ref) < 1e-4

    def test_feat_norm_loss(self, rng):
        feats = [rng.randn(2, 4, 4, 8).astype(np.float32) for _ in range(3)]
        ours = float(L.compute_feat_norm_loss({"raw_feats": [jnp.asarray(f) for f in feats]}))
        ref = float(sum(t(f).pow(2).mean() for f in feats))
        assert abs(ours - ref) < 1e-4

    def test_single_model_recon_channel_mean(self, rng):
        # recon head outputs 1 channel; input has 14 -> target is channel mean
        recon = rng.randn(2, 8, 8, 1).astype(np.float32)
        inputs = rng.rand(2, 16, 16, 14).astype(np.float32)
        ours = float(
            L.single_model_recon_loss([jnp.asarray(recon), None], jnp.asarray(inputs))
        )
        up = TF.interpolate(
            t(recon).permute(0, 3, 1, 2), size=(16, 16), mode="bilinear",
            align_corners=False,
        )
        target = t(inputs).permute(0, 3, 1, 2).mean(dim=1, keepdim=True)
        p = torch.sigmoid(up).clamp(0, 1)
        ref = float(torch.mean(torch.sqrt((p - target.clamp(0, 1)) ** 2 + 1e-6)))
        assert abs(ours - ref) < 2e-4  # bilinear resize impls differ at 1e-7 level

    def test_recon_list_loss_normalizes(self, rng):
        r1 = rng.randn(2, 8, 8, 1).astype(np.float32)
        r2 = rng.randn(2, 4, 4, 1).astype(np.float32)
        inputs = rng.rand(2, 8, 8, 1).astype(np.float32)
        both = float(
            L.compute_recon_list_loss(
                [jnp.asarray(r1), jnp.asarray(r2)], jnp.asarray(inputs)
            )
        )
        one = float(L.compute_recon_list_loss(jnp.asarray(r1), jnp.asarray(inputs)))
        two = float(L.compute_recon_list_loss(jnp.asarray(r2), jnp.asarray(inputs)))
        assert abs(both - (one + two) / 2) < 1e-6


class TestSelectors:
    def test_wfl_selector(self):
        from dmf_tpu.config import default_parameters

        cfg = default_parameters()
        labels = jnp.asarray([0, 1, 1, 2, 3, 3])
        fn = L.get_classification_loss_fn(cfg, labels, "dwi")
        logits = jnp.zeros((6, 4))
        val = float(fn(logits, labels))
        assert np.isfinite(val) and val > 0

    def test_mask_selector(self):
        from dmf_tpu.config import default_parameters

        cfg = default_parameters()
        fn = L.get_mask_loss_fn(cfg, "dwi")
        assert fn is L.soft_dice_loss


class TestReconSelector:
    def test_mse_selector(self):
        """selector_helpers.py:51-64: mse-only, None when disabled."""
        import dataclasses

        from dmf_tpu.config import default_parameters
        from dmf_tpu.losses.selectors import get_recon_loss_fn

        cfg = default_parameters()
        fn = get_recon_loss_fn(cfg, "dwi")
        a = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 1),
                        jnp.float32)
        b = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 1),
                        jnp.float32)
        want = torch.nn.MSELoss()(torch.tensor(np.asarray(a)),
                                  torch.tensor(np.asarray(b))).item()
        assert abs(float(fn(a, b)) - want) < 1e-6

        off = cfg.replace(dwi_model=dataclasses.replace(
            cfg.dwi_model, recon_enabled=False))
        assert get_recon_loss_fn(off, "dwi") is None

        bad = cfg.replace(dwi_model=dataclasses.replace(
            cfg.dwi_model, reconstruction_loss_code="l1"))
        with pytest.raises(ValueError):
            get_recon_loss_fn(bad, "dwi")

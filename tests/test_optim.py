"""Optimizer parity vs torch.optim.AdamW and freeze/unfreeze semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dmf_tpu.config import default_parameters
from dmf_tpu.train import (
    FusionOptController,
    GroupSpec,
    GroupedHyperParams,
    SingleModelOptController,
    adamw_init,
    adamw_update,
    build_group_spec,
    classify_param,
    discriminative_hparams,
)


class TestAdamWParity:
    def test_matches_torch_adamw(self, rng):
        w = rng.randn(8, 4).astype(np.float32)
        params = {"layer": {"kernel": jnp.asarray(w)}}
        spec = GroupSpec(group_ids={"layer": {"kernel": 0}}, num_groups=1,
                         names=("g0",))
        hp = GroupedHyperParams(
            lr=jnp.asarray([1e-3]), wd=jnp.asarray([1e-2]),
            trainable=jnp.asarray([1.0]),
        )
        state = adamw_init(params)

        tw = torch.nn.Parameter(torch.tensor(w))
        topt = torch.optim.AdamW([tw], lr=1e-3, betas=(0.9, 0.999), eps=1e-8,
                                 weight_decay=1e-2)
        for step in range(5):
            g = rng.randn(8, 4).astype(np.float32)
            grads = {"layer": {"kernel": jnp.asarray(g)}}
            params, state = adamw_update(grads, state, params, spec, hp)
            topt.zero_grad()
            tw.grad = torch.tensor(g)
            topt.step()
            assert np.allclose(
                np.asarray(params["layer"]["kernel"]), tw.detach().numpy(),
                atol=1e-5,
            ), f"divergence at step {step}"

    def test_frozen_group_untouched(self, rng):
        w = rng.randn(4, 4).astype(np.float32)
        params = {"a": jnp.asarray(w), "b": jnp.asarray(w.copy())}
        spec = GroupSpec(group_ids={"a": 0, "b": 1}, num_groups=2, names=("a", "b"))
        hp = GroupedHyperParams(
            lr=jnp.asarray([1e-2, 1e-2]), wd=jnp.asarray([1e-2, 1e-2]),
            trainable=jnp.asarray([0.0, 1.0]),
        )
        state = adamw_init(params)
        grads = {"a": jnp.ones((4, 4)), "b": jnp.ones((4, 4))}
        new_params, new_state = adamw_update(grads, state, params, spec, hp)
        assert np.array_equal(np.asarray(new_params["a"]), w)  # frozen: no wd either
        assert not np.array_equal(np.asarray(new_params["b"]), w)
        assert np.all(np.asarray(new_state.mu["a"]) == 0)  # moments stay clean

    def test_excluded_leaf(self, rng):
        w = rng.randn(2, 2).astype(np.float32)
        params = {"classification_head": jnp.asarray(w)}
        spec = GroupSpec(group_ids={"classification_head": -1}, num_groups=1,
                         names=("g",))
        hp = GroupedHyperParams(
            lr=jnp.asarray([1.0]), wd=jnp.asarray([1.0]),
            trainable=jnp.asarray([1.0]),
        )
        state = adamw_init(params)
        new_params, _ = adamw_update(
            {"classification_head": jnp.ones((2, 2))}, state, params, spec, hp
        )
        assert np.array_equal(np.asarray(new_params["classification_head"]), w)


class TestGrouping:
    def test_classify_matches_reference_rules(self):
        assert classify_param("backbone_adapter/backbone/conv1", True) == 0
        assert classify_param("block1/conv", True) == 1
        assert classify_param("block2/conv", True) == 1
        assert classify_param("block3/conv", True) == 2
        assert classify_param("proj_f1/conv", True) == 2
        # without backbone: block1 is its own group
        assert classify_param("block1/conv", False) == 0
        assert classify_param("block2/conv", False) == 1

    def test_classification_head_excluded_in_compat(self):
        params = {
            "block1": {"kernel": jnp.zeros((2, 2))},
            "classification_head": {"kernel": jnp.zeros((2, 2))},
        }
        spec = build_group_spec(params, use_backbone=False, reference_compat=True)
        assert spec.group_ids["classification_head"]["kernel"] == -1
        spec2 = build_group_spec(params, use_backbone=False, reference_compat=False)
        assert spec2.group_ids["classification_head"]["kernel"] == 2

    def test_discriminative_hparams(self):
        cfg = default_parameters()
        lrs, wds = discriminative_hparams(cfg.dwi_model.optimizer, 3)
        # selector_helpers.py:262-271 with base 1e-4, f=1.2, reg 1e-4, g=0.8
        assert np.allclose(lrs, [1e-4 / 1.44, 1e-4 / 1.2, 1e-4])
        assert np.allclose(wds, [1e-4 * 0.64, 1e-4 * 0.8, 1e-4])


class TestControllers:
    def test_single_model_unfreeze_at_timer(self):
        cfg = default_parameters()
        ctl = SingleModelOptController(cfg, "dwi")
        ctl.on_epoch_start(0)
        hp = ctl.hyperparams()
        assert float(hp.trainable[0]) == 0.0  # backbone frozen
        ctl.on_epoch_start(cfg.foundation_model_unfreeze_timer)
        hp = ctl.hyperparams()
        assert float(hp.trainable[0]) == 1.0
        assert abs(float(hp.lr[0]) - cfg.foundation_model_unfreeze_lr) < 1e-12
        assert float(hp.wd[0]) == 0.0  # reference's misspelled wd key -> 0

    def test_fusion_gradual_unfreeze_deep_to_shallow(self):
        cfg = default_parameters()
        ctl = FusionOptController(cfg)
        hp = ctl.hyperparams()
        assert list(np.asarray(hp.trainable)) == [0, 0, 0, 1]  # only fusion head
        t = cfg.unfreeze_timer
        ctl.on_epoch_start(t)  # unfreeze group 2 (deepest encoder group)
        hp = ctl.hyperparams()
        assert list(np.asarray(hp.trainable)) == [0, 0, 1, 1]
        assert abs(float(hp.lr[2]) - cfg.backbone_unfreeze_lr) < 1e-12
        ctl.on_epoch_start(2 * t)
        ctl.on_epoch_start(3 * t)
        hp = ctl.hyperparams()
        assert list(np.asarray(hp.trainable)) == [1, 1, 1, 1]
        # k=3: lr = unfreeze_lr * factor^2
        assert abs(
            float(hp.lr[0])
            - cfg.backbone_unfreeze_lr * cfg.backbone_unfreeze_lr_factor**2
        ) < 1e-12
        # idempotent at non-multiples
        ctl.on_epoch_start(3 * t + 1)
        assert ctl.layers_unfrozen == 3


class TestSchedulers:
    def test_plateau_matches_torch(self):
        from dmf_tpu.train import ReduceLROnPlateau

        ours = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=1e-6,
                                 threshold=1e-4, base_lr=1e-3)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.5, patience=2, min_lr=1e-6, threshold=1e-4
        )
        metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.5, 0.5, 0.5, 0.5, 0.49, 0.1]
        for m in metrics:
            scale = ours.step(m)
            sch.step(m)
            torch_lr = opt.param_groups[0]["lr"]
            assert abs(scale * 1e-3 - torch_lr) < 1e-12, (m, scale, torch_lr)

    def test_early_stopping(self):
        from dmf_tpu.train import EarlyStopping

        es = EarlyStopping(mode="max", patience=2, min_delta=0.01)
        assert not es.step(0.5)
        assert not es.step(0.6)
        assert not es.step(0.605)  # below min_delta: bad epoch 1
        assert es.step(0.60)  # bad epoch 2 -> stop

    def test_aux_weight(self):
        from dmf_tpu.train import aux_loss_weight

        assert aux_loss_weight(0, 200) == 1.0
        assert abs(aux_loss_weight(100, 200) - 0.5) < 1e-12
        assert aux_loss_weight(300, 200) == 0.0
        assert aux_loss_weight(300, 200, enabled=False) == 1.0


class TestPerGroupBiasCorrection:
    def test_unfrozen_group_matches_fresh_torch_param_group(self, rng):
        """A group unfrozen mid-training must bias-correct from step 1,
        exactly like the reference's freshly-added torch param group
        (selector_helpers.py:207-217): a global step count would make the
        first update ~1/sqrt(1-b2) ~ 3.2x too large."""
        w0 = rng.randn(6, 3).astype(np.float32)
        w1 = rng.randn(6, 3).astype(np.float32)
        params = {"a": {"kernel": jnp.asarray(w0)},
                  "b": {"kernel": jnp.asarray(w1)}}
        spec = GroupSpec(group_ids={"a": {"kernel": 0}, "b": {"kernel": 1}},
                         num_groups=2, names=("g0", "g1"))
        state = adamw_init(params)

        t0 = torch.nn.Parameter(torch.tensor(w0))
        t1 = torch.nn.Parameter(torch.tensor(w1))
        topt = torch.optim.AdamW([t0], lr=1e-3, betas=(0.9, 0.999),
                                 eps=1e-8, weight_decay=1e-2)

        frozen = GroupedHyperParams(lr=jnp.asarray([1e-3, 1e-3]),
                                    wd=jnp.asarray([1e-2, 1e-2]),
                                    trainable=jnp.asarray([1.0, 0.0]))
        for step in range(10):
            g0 = rng.randn(6, 3).astype(np.float32)
            grads = {"a": {"kernel": jnp.asarray(g0)},
                     "b": {"kernel": jnp.zeros_like(jnp.asarray(w1))}}
            params, state = adamw_update(grads, state, params, spec, frozen)
            t0.grad = torch.tensor(g0)
            topt.step()

        # unfreeze: torch adds a fresh param group
        topt.add_param_group({"params": [t1], "lr": 1e-3,
                              "weight_decay": 1e-2})
        live = GroupedHyperParams(lr=jnp.asarray([1e-3, 1e-3]),
                                  wd=jnp.asarray([1e-2, 1e-2]),
                                  trainable=jnp.asarray([1.0, 1.0]))
        for step in range(3):
            g0 = rng.randn(6, 3).astype(np.float32)
            g1 = rng.randn(6, 3).astype(np.float32)
            grads = {"a": {"kernel": jnp.asarray(g0)},
                     "b": {"kernel": jnp.asarray(g1)}}
            params, state = adamw_update(grads, state, params, spec, live)
            t0.grad = torch.tensor(g0)
            t1.grad = torch.tensor(g1)
            topt.step()

        np.testing.assert_allclose(np.asarray(params["a"]["kernel"]),
                                   t0.detach().numpy(), atol=2e-6)
        np.testing.assert_allclose(np.asarray(params["b"]["kernel"]),
                                   t1.detach().numpy(), atol=2e-6)


def test_describe_groups_dump():
    """Param-group debug dump (selector_helpers.py:336-353 parity): per-group
    leaf/param counts, lr/wd/trainable, excluded classification head."""
    import jax.numpy as jnp

    from dmf_tpu.train.optim import build_group_spec, describe_groups, discriminative_hparams
    from dmf_tpu.train.optim import GroupedHyperParams

    params = {
        "block1": {"Conv_0": {"kernel": jnp.zeros((3, 3, 4, 8))}},
        "block2": {"Conv_0": {"kernel": jnp.zeros((3, 3, 8, 16))}},
        "mask_head": {"Conv_0": {"kernel": jnp.zeros((1, 1, 16, 1)),
                                 "bias": jnp.zeros((1,))}},
        "classification_head": {"Dense_0": {"kernel": jnp.zeros((16, 4))}},
    }
    spec = build_group_spec(params, use_backbone=False, reference_compat=True)
    hp = GroupedHyperParams(lr=jnp.asarray([1e-3, 1e-3, 1e-3]),
                            wd=jnp.asarray([1e-2, 1e-2, 1e-2]),
                            trainable=jnp.asarray([1.0, 0.0, 1.0]))
    text = describe_groups(params, spec, hp)
    assert "group 0 (block1)" in text
    assert "[excluded]" in text          # classification head (compat quirk)
    assert "trainable=0" in text         # frozen group visible
    assert "block1/Conv_0/kernel" in text
    assert f"{3 * 3 * 4 * 8:,}" in text  # param count

"""Config migration between the reference's ``parameters`` dict and Config.

``to_reference_dict`` (ours -> reference layout) already backs the
genuine-module tests; here its inverse ``from_reference_dict`` is pinned:
round-trip identity, and a direct import of the GENUINE reference
parameters dict built by executing /root/reference/code/parameters_generate.py
(with its ``torch.save`` side effects stubbed out).
"""

import dataclasses

import pytest

from dmf_tpu.config import (
    Config,
    default_parameters,
    from_reference_dict,
    to_reference_dict,
)

REF_PARAMS = "/root/reference/code/parameters_generate.py"


def _genuine_reference_parameters():
    """Execute the reference's parameter builder, stubbing torch.save
    (parameters_generate.py:297-304 writes artifacts to a Drive path)."""

    class _TorchStub:
        @staticmethod
        def save(*a, **k):
            return None

    with open(REF_PARAMS) as f:
        # drop its `import torch` so the stub below (a no-op .save) wins
        src = "\n".join(
            line for line in f.read().splitlines()
            if line.strip() != "import torch"
        )
    ns = {"torch": _TorchStub()}
    exec(compile(src, REF_PARAMS, "exec"), ns)
    return ns["parameters"]


class TestRoundTrip:
    def test_default_round_trips(self):
        cfg = default_parameters()
        assert from_reference_dict(to_reference_dict(cfg)) == cfg

    def test_mutated_round_trips(self):
        cfg = default_parameters(
            num_epochs=7,
            batch_size=16,
            methods=("dwi",),
            test_mode="mc",
            mc_passes=3,
            dwi_bvals_to_use=(0, 1, 2),
            dwi_model=dataclasses.replace(
                default_parameters().dwi_model,
                channels=(32, 64, 96),
                use_backbone=False,
                backbone_str="resnet50d",
                dropout=0.35,
            ),
        )
        back = from_reference_dict(to_reference_dict(cfg))
        assert back == cfg

    def test_nested_leafs_round_trip(self):
        base = default_parameters()
        mc = dataclasses.replace(
            base.fusion_model,
            classification_loss=dataclasses.replace(
                base.fusion_model.classification_loss, gamma=2.5, alpha=0.3
            ),
            mask=dataclasses.replace(
                base.fusion_model.mask, mask_loss_type="dice_bce",
                mask_target_size=(16, 16),
            ),
            optimizer=dataclasses.replace(
                base.fusion_model.optimizer, lr=3e-4, num_lr_groups=2
            ),
            scheduler=dataclasses.replace(
                base.fusion_model.scheduler, name="cosine", t_max=123
            ),
            fusion_specific=dataclasses.replace(
                base.fusion_model.fusion_specific, fusion_channels=64,
                token_pool=(2, 2),
            ),
        )
        cfg = dataclasses.replace(base, fusion_model=mc)
        back = from_reference_dict(to_reference_dict(cfg))
        assert back.fusion_model == mc
        assert back == cfg


class TestGenuineReferenceDict:
    @pytest.fixture(scope="class")
    def ref_params(self):
        return _genuine_reference_parameters()

    def test_imports_without_error(self, ref_params):
        cfg = from_reference_dict(ref_params)
        assert isinstance(cfg, Config)

    def test_core_knobs_carry_over(self, ref_params):
        cfg = from_reference_dict(ref_params)
        assert cfg.num_epochs == ref_params["num_epochs"]
        assert cfg.batch_size == ref_params["batch_size"]
        assert cfg.segnum == ref_params["segnum"]
        assert cfg.class_num == ref_params["class_num"]
        assert cfg.methods == tuple(ref_params["methods"])
        assert cfg.patience == ref_params["patience"]
        assert cfg.test_mode == ref_params["test_mode"]
        assert cfg.mc_passes == ref_params["mc_passes"]
        assert cfg.dwi_model.input_size == 256
        assert cfg.dwi_model.channels == tuple(
            ref_params["dwi_model_parameters"]["channels"]
        )
        assert cfg.dwi_model.backbone_str == "radimagenet"
        assert (
            cfg.fusion_model.fusion_specific.dwi_out_channels
            == ref_params["fusion_model_parameters"]
            ["fusion_specific_parameters"]["dwi_out_channels"]
        )
        assert cfg.dwi_model.scheduler.patience == int(
            5 + ref_params["patience"] / 3
        )

    def test_derived_fields_agree_with_reference_computation(self, ref_params):
        """The reference computes these imperatively
        (parameters_generate.py:262-283); ours are properties of the same
        inputs — they must agree on the genuine dict."""
        cfg = from_reference_dict(ref_params)
        assert cfg.dwi_base_channel_num == ref_params["dwi_base_channel_num"]
        assert cfg.dwi_channel_num == ref_params["dwi_channel_num"]
        assert cfg.dce_channel_num == ref_params["dce_channel_num"]
        assert cfg.min_epochs == ref_params["min_epochs"]
        assert (
            cfg.aux_loss_weight_epoch_limit
            == ref_params["aux_loss_weight_epoch_limit"]
        )

    def test_precision_maps_to_tpu_native(self, ref_params):
        assert ref_params["precision"] == "16-mixed"
        cfg = from_reference_dict(ref_params)
        assert cfg.precision == "bf16-mixed"

    def test_optimizer_name_normalized(self, ref_params):
        assert ref_params["dwi_model_parameters"]["optimizer_parameters"][
            "name"
        ] == "adamW"
        cfg = from_reference_dict(ref_params)
        assert cfg.dwi_model.optimizer.name == "adamw"

    def test_environment_keys_ignored(self, ref_params):
        cfg = from_reference_dict(ref_params)
        # base_path carries over; the artifact-path bookkeeping does not
        assert cfg.base_path == ref_params["base_path"]
        assert not hasattr(cfg, "masks_path")
        assert not hasattr(cfg, "data_key_mod")

    def test_aliasing_dissolved(self, ref_params):
        """dwi/dce/fusion params are ONE mutable dict in the reference
        (parameters_generate.py:174, 183); here each modality is its own
        frozen object."""
        assert (
            ref_params["dce_model_parameters"]
            is ref_params["dwi_model_parameters"]
        )
        cfg = from_reference_dict(ref_params)
        assert cfg.dwi_model is not cfg.dce_model
        mutated = dataclasses.replace(cfg.dwi_model, dropout=0.9)
        assert cfg.dce_model.dropout != 0.9
        assert mutated.dropout == 0.9

    def test_overrides_win(self, ref_params):
        cfg = from_reference_dict(ref_params, batch_size=4, seed=7)
        assert cfg.batch_size == 4
        assert cfg.seed == 7


class TestRobustness:
    def test_missing_keys_keep_defaults(self):
        cfg = from_reference_dict({"num_epochs": 3})
        assert cfg.num_epochs == 3
        assert cfg.batch_size == default_parameters().batch_size
        assert cfg.dwi_model == default_parameters().dwi_model

    def test_unknown_keys_ignored(self):
        cfg = from_reference_dict(
            {"no_such_knob": 1, "dwi_model_parameters": {"dropout": 0.5,
                                                         "bogus": True}}
        )
        assert cfg.dwi_model.dropout == 0.5

    def test_json_round_trip_composes(self):
        """reference dict -> Config -> JSON -> Config stays equal."""
        cfg = from_reference_dict(_genuine_reference_parameters())
        assert Config.from_dict(
            __import__("json").loads(cfg.to_json())
        ) == cfg

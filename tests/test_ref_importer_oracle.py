"""RadImageNet importer raced against the GENUINE reference remap code.

The genuine ``Lab-Rasool/RadImageNet`` artifact cannot be fetched here
(zero network egress — ``scripts/fetch_radimagenet.py`` documents the
one-shot fetch for a networked host), so this file implements the
strongest obtainable proxy (VERDICT r3 #5): our
``map_rasool_to_timm_keys`` / first-conv adapters must be EXTENSIONALLY
IDENTICAL to the reference's own functions (foundation_model.py:99-218) —
the code that defines which artifact layouts the reference accepts — over
the complete 320-tensor state dict of the timm-semantics torch ResNet50
oracle, under every prefix/layout variant the genuine code handles.
Whatever key layout the real artifact has: if it loads in the reference,
it maps identically here; if it doesn't, the reference breaks too.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

from dmf_tpu.models.backbones import importers as ours

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_fm():
    """Import the genuine foundation_model with its unavailable heavy deps
    stubbed (timm / torchvision.models are absent in this image; the
    functions under test use neither)."""
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    tvm = types.ModuleType("torchvision.models")
    sys.modules.setdefault("torchvision.models", tvm)
    if not hasattr(sys.modules["torchvision"], "models"):
        sys.modules["torchvision"].models = tvm
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import foundation_model

    return foundation_model


def _full_resnet50_sd():
    from tests.test_importers import TimmResNet50, _randomize

    net = TimmResNet50(in_ch=3)
    _randomize(net, seed=11)
    return net.state_dict()


def _to_rasool(sd, prefix=""):
    """Rename a timm/torchvision-layout resnet50 state dict into the
    Lab-Rasool layout the genuine map inverts: stem 0./1., layers 4..7,
    classifier under fc. (foundation_model.py:186-218)."""
    idx = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
           "layer3": "6", "layer4": "7"}
    out = {}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        out[f"{prefix}{idx[head]}.{rest}"] = v
    out[f"{prefix}fc.weight"] = torch.zeros(1000, 2048)
    out[f"{prefix}fc.bias"] = torch.zeros(1000)
    return out


class TestRasoolMapGenuineOracle:
    @pytest.mark.parametrize("prefix", ["", "backbone."],
                             ids=["bare", "backbone-prefixed"])
    def test_map_identical_to_genuine_on_full_resnet50(self, ref_fm, prefix):
        """Key-for-key, tensor-for-tensor identity with the genuine map
        over all ~320 tensors (incl. num_batches_tracked), both prefix
        variants the genuine code strips."""
        sd = _full_resnet50_sd()
        rasool = _to_rasool(sd, prefix=prefix)
        assert len(rasool) > 100

        genuine = ref_fm.map_rasool_to_timm_keys(dict(rasool))
        mine = ours.map_rasool_to_timm_keys(dict(rasool))

        assert set(mine) == set(genuine), (
            set(mine) ^ set(genuine))
        for k in genuine:
            assert mine[k] is genuine[k] or np.array_equal(
                np.asarray(mine[k]), np.asarray(genuine[k])), k

        # the genuine map must land exactly on the timm key set minus the
        # classifier — proving the synthetic layout above is the one the
        # reference accepts (zero unmapped non-fc keys)
        assert set(genuine) == set(sd.keys())

    def test_mapped_dict_imports_to_full_backbone(self, ref_fm):
        """The genuine map's output chains into import_resnet50 with the
        >=100-tensor guard satisfied and a finite forward."""
        import jax.numpy as jnp

        from dmf_tpu.models.backbones.resnet import ResNetFeatures

        rasool = _to_rasool(_full_resnet50_sd(), prefix="backbone.")
        mapped = ref_fm.map_rasool_to_timm_keys(rasool)  # genuine remap
        params, stats = ours.import_resnet50(mapped, in_channels=14)
        n = sum(1 for _ in ours._iter_arrays(params)) + sum(
            1 for _ in ours._iter_arrays(stats))
        assert n >= 100
        feats = ResNetFeatures(in_channels=14).apply(
            {"params": params, "batch_stats": stats},
            jnp.zeros((1, 32, 32, 14)), train=False)
        assert all(bool(jnp.isfinite(f).all()) for f in feats)

    def test_unknown_layout_trips_guard(self, ref_fm):
        """A renamed key set (the failure mode the fetch validates against)
        must not silently import: both the genuine map and ours pass
        unknown keys through untouched, and the importer's tensor guard
        then refuses the load."""
        sd = _full_resnet50_sd()
        renamed = {f"encoder.{k}": v for k, v in sd.items()}
        genuine = ref_fm.map_rasool_to_timm_keys(dict(renamed))
        mine = ours.map_rasool_to_timm_keys(dict(renamed))
        assert set(mine) == set(genuine) == set(renamed)  # both no-op
        with pytest.raises((RuntimeError, KeyError)):
            ours.import_resnet50(mine, in_channels=3)


class TestFirstConvAdaptGenuineOracle:
    def test_adapt_first_conv_matches(self, ref_fm):
        sd = {"conv1.weight": torch.randn(64, 3, 7, 7)}
        genuine = ref_fm.adapt_first_conv(
            {k: v.clone() for k, v in sd.items()}, 14)["conv1.weight"]
        mine = ours.adapt_first_conv(sd["conv1.weight"].numpy(), 14)
        np.testing.assert_allclose(mine, genuine.numpy(), rtol=1e-6)

    def test_advanced_adapt_matches(self, ref_fm):
        """BT.601 luminance + deterministic linspace scaling
        (foundation_model.py:128-176) — including the genuine heuristic
        that picks the 4-D weight with the smallest input-channel count."""
        sd = {
            "conv1.weight": torch.randn(64, 3, 7, 7),
            "layer1.0.conv1.weight": torch.randn(64, 64, 1, 1),
        }
        genuine = ref_fm.advanced_adapt_first_conv(
            {k: v.clone() for k, v in sd.items()}, 14)
        mine = ours.advanced_adapt_first_conv(sd["conv1.weight"].numpy(), 14)
        np.testing.assert_allclose(mine, genuine["conv1.weight"].numpy(),
                                   rtol=1e-5, atol=1e-7)
        # the other conv untouched
        np.testing.assert_array_equal(genuine["layer1.0.conv1.weight"],
                                      sd["layer1.0.conv1.weight"])

    def test_advanced_adapt_grayscale_fallback(self, ref_fm):
        sd = {"conv1.weight": torch.randn(64, 1, 7, 7)}
        genuine = ref_fm.advanced_adapt_first_conv(
            {k: v.clone() for k, v in sd.items()}, 6)["conv1.weight"]
        mine = ours.advanced_adapt_first_conv(sd["conv1.weight"].numpy(), 6)
        np.testing.assert_allclose(mine, genuine.numpy(), rtol=1e-5,
                                   atol=1e-7)

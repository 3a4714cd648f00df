"""AOT serving artifact tests (dmf_tpu/serving.py): export the serving
program to StableHLO bytes, deserialize, and pin numeric equality with the
live program — including the uncertainty ensemble and the
weights-as-arguments contract (one artifact, many checkpoints)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.config import default_parameters
from dmf_tpu.models import Encoder, FusionModel
from dmf_tpu.serving import export_serving, load_serving, make_serving_fn


def tiny_cfg(**kw):
    cfg = default_parameters(mc_passes=3, **kw)
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
def fusion_setup():
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
    variables = {"dwi": dwi_vars, "dce": dce_vars, "fusion": fusion_vars}
    return cfg, dwi, dce, fusion, variables, xd, xc


def _args(variables, xd, xc, seed=7):
    return (variables, xd, xc, jnp.uint32(seed))


class TestServingArtifact:
    def test_normal_mode_roundtrip(self, fusion_setup):
        cfg, dwi, dce, fusion, variables, xd, xc = fusion_setup
        fn = make_serving_fn(cfg, dwi, dce, fusion, mode="normal")
        args = _args(variables, xd, xc)
        mean0, std0 = jax.jit(fn)(*args)
        data = export_serving(fn, args, platforms=("cpu",))
        assert isinstance(data, bytes) and len(data) > 0

        served = load_serving(data)
        mean1, std1 = served(*args)
        np.testing.assert_allclose(np.asarray(mean0), np.asarray(mean1),
                                   rtol=1e-6, atol=1e-7)
        assert np.all(np.asarray(std1) == 0)
        np.testing.assert_allclose(np.asarray(mean1).sum(-1), 1.0, atol=1e-5)

    def test_uncertainty_mode_roundtrip(self, fusion_setup):
        """The full TTA x MC ensemble exports as one artifact; the same seed
        reproduces the same ensemble through the deserialized program."""
        cfg, dwi, dce, fusion, variables, xd, xc = fusion_setup
        fn = make_serving_fn(cfg, dwi, dce, fusion, mode="tta_mc")
        args = _args(variables, xd, xc, seed=21)
        mean0, std0 = jax.jit(fn)(*args)
        served = load_serving(export_serving(fn, args, platforms=("cpu",)))
        mean1, std1 = served(*args)
        np.testing.assert_allclose(np.asarray(mean0), np.asarray(mean1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(std0), np.asarray(std1),
                                   rtol=1e-4, atol=1e-6)
        assert float(np.asarray(std1).mean()) > 1e-6  # MC variance survives

    def test_artifact_file_and_fresh_weights(self, fusion_setup, tmp_path):
        """Weights ride as arguments: the artifact written to disk serves a
        DIFFERENT checkpoint of the same geometry without re-export."""
        cfg, dwi, dce, fusion, variables, xd, xc = fusion_setup
        fn = make_serving_fn(cfg, dwi, dce, fusion, mode="normal")
        path = str(tmp_path / "serving.stablehlo")
        export_serving(fn, _args(variables, xd, xc), path=path,
                       platforms=("cpu",))
        served = load_serving(path)

        # perturb every weight -> a "new checkpoint"
        variables2 = jax.tree.map(lambda a: a + 0.01, variables)
        args2 = _args(variables2, xd, xc)
        mean_direct, _ = jax.jit(fn)(*args2)
        mean_served, _ = served(*args2)
        np.testing.assert_allclose(np.asarray(mean_direct),
                                   np.asarray(mean_served),
                                   rtol=1e-6, atol=1e-7)
        # and it actually changed vs the original weights
        mean_orig, _ = served(*_args(variables, xd, xc))
        assert not np.allclose(np.asarray(mean_orig),
                               np.asarray(mean_served), atol=1e-6)


class TestCLIExportServing:
    def test_cli_export_serving(self, tmp_path):
        """`dmf_tpu export-serving --tiny` writes a deserializable artifact
        with the requested batch geometry."""
        from jax import export as jexport

        from dmf_tpu import cli

        out = str(tmp_path / "serving.stablehlo")
        rc = cli.main(["export-serving", "--tiny", "--out", out,
                       "--mode", "normal", "--batch", "2",
                       "--platforms", "cpu"])
        assert rc == 0
        with open(out, "rb") as f:
            exported = jexport.deserialize(f.read())
        shapes = [tuple(a.shape) for a in exported.in_avals
                  if len(a.shape) == 4]
        assert (2, 32, 32, 14) in shapes  # the DWI serving input
        assert (2, 32, 32, 6) in shapes  # the DCE serving input

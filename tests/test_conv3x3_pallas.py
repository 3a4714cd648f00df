"""Fused conv3x3+BN+GELU kernel parity vs the XLA chain (interpret mode).

Experimental serving kernel targeting the profiled neck-conv emitter
outlier; see ops/conv3x3_pallas.py for the measured motivation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.ops.conv3x3_pallas import conv3x3_bn_gelu


@pytest.fixture
def setup():
    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout = 2, 8, 8, 128, 128
    return dict(
        x=jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32)) * 0.5,
        k=jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32)) * 0.05,
        b=jnp.asarray(rng.randn(Cout).astype(np.float32)) * 0.01,
        g=jnp.asarray(rng.rand(Cout).astype(np.float32)) + 0.5,
        beta=jnp.asarray(rng.randn(Cout).astype(np.float32)) * 0.01,
        mu=jnp.asarray(rng.randn(Cout).astype(np.float32)) * 0.01,
        var=jnp.asarray(rng.rand(Cout).astype(np.float32)) + 0.5,
    )


def xla_ref(s, dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        s["x"].astype(dtype), s["k"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + s["b"]
    y = (y - s["mu"]) / jnp.sqrt(s["var"] + 1e-5) * s["g"] + s["beta"]
    return jax.nn.gelu(y, approximate=False).astype(dtype)


class TestConv3x3Kernel:
    def test_matches_xla_chain_fp32(self, setup):
        out = conv3x3_bn_gelu(setup["x"], setup["k"], setup["b"],
                              setup["g"], setup["beta"], setup["mu"],
                              setup["var"], interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(xla_ref(setup)),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_xla_chain_bf16(self, setup):
        s16 = dict(setup, x=setup["x"].astype(jnp.bfloat16))
        out = conv3x3_bn_gelu(s16["x"], setup["k"], setup["b"],
                              setup["g"], setup["beta"], setup["mu"],
                              setup["var"], interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(xla_ref(setup, jnp.bfloat16), np.float32),
            rtol=5e-2, atol=5e-2)

    def test_cpu_adapter_dispatch_is_noop(self, monkeypatch):
        """DMF_FUSED_NECK=1 must be silent off-TPU: the adapter keeps the
        XLA neck chain bit-for-bit."""
        from dmf_tpu.models.adapter import BackboneAdapter
        from flax import linen as nn

        class StubBackbone(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                return [x, x * 0.5]

        adapter = BackboneAdapter(
            backbone=StubBackbone(),
            selected_indices_chains=((0,), (1,), (0, 1)),
            out_channels=(128, 128, 128))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 128),
                        jnp.float32)
        variables = adapter.init(jax.random.PRNGKey(0), x, train=False)
        a = adapter.apply(variables, x, train=False)
        monkeypatch.setenv("DMF_FUSED_NECK", "1")
        b = adapter.apply(variables, x, train=False)
        for ai, bi in zip(a, b):
            np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi))

    def test_geometry_gate(self):
        from dmf_tpu.ops.conv3x3_pallas import geometry_ok

        assert geometry_ok((128, 64, 64, 128), 128, jnp.bfloat16)
        assert geometry_ok((128, 32, 32, 2048), 256, jnp.bfloat16)
        assert not geometry_ok((128, 64, 64, 130), 128, jnp.bfloat16)
        assert not geometry_ok((128, 64, 64, 128), 96, jnp.bfloat16)
        assert not geometry_ok((8, 128, 128, 512), 128, jnp.bfloat16)  # 16MB

    def test_transposed_variant_matches(self, setup):
        """B=8 admits a sublane-full tile -> the layout-matched (H,W,B,C)
        kernel runs; same numerics contract as the (B,H,W,C) variant."""
        from dmf_tpu.ops.conv3x3_pallas import _pick_bt_t

        s = dict(setup, x=jnp.tile(setup["x"], (4, 1, 1, 1)))
        assert _pick_bt_t(8, s["x"][0].nbytes) == 8
        out = conv3x3_bn_gelu(s["x"], s["k"], s["b"], s["g"], s["beta"],
                              s["mu"], s["var"], interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla_ref(s)),
                                   rtol=2e-5, atol=2e-5)

    def test_transposed_off_matches(self, setup, monkeypatch):
        """DMF_FUSED_NECK_T=0 reverts to the (B,H,W,C) kernel with
        identical results."""
        s = dict(setup, x=jnp.tile(setup["x"], (4, 1, 1, 1)))
        a = conv3x3_bn_gelu(s["x"], s["k"], s["b"], s["g"], s["beta"],
                            s["mu"], s["var"], interpret=True)
        monkeypatch.setenv("DMF_FUSED_NECK_T", "0")
        b = conv3x3_bn_gelu(s["x"], s["k"], s["b"], s["g"], s["beta"],
                            s["mu"], s["var"], interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)

    def test_pick_bt_t(self):
        from dmf_tpu.ops.conv3x3_pallas import _pick_bt_t

        # B not divisible by 8: whole-batch full-dim escape hatch (the
        # same rule epilogue_pallas._batch_tile_t documents)
        assert _pick_bt_t(2, 1024) == 2
        assert _pick_bt_t(12, 1 << 30) is None      # escape over budget
        assert _pick_bt_t(128, 1 << 30) is None     # map too big for 8
        assert _pick_bt_t(24, 64 * 1024) == 24
        bt = _pick_bt_t(128, 128 * 1024)            # budget caps the tile
        assert bt is not None and bt % 8 == 0 and 128 % bt == 0
        assert bt * 128 * 1024 <= 8 * 1024 * 1024

    def test_pick_bt_t_reachable_at_production_geometry(self):
        """Regression (r3 advisor, medium): under the old 2 MB budget the
        transposed variant could never dispatch at any real neck site
        (per-sample maps >= 512 KB bf16), silently measuring the (B,H,W,C)
        kernel in every sweep.  neck_f1 at 64^2x128 bf16 must admit a
        sublane-full tile."""
        from dmf_tpu.ops.conv3x3_pallas import _pick_bt_t

        assert _pick_bt_t(128, 64 * 64 * 128 * 2) >= 8

    def test_site_allowlist(self, monkeypatch):
        from dmf_tpu.ops.conv3x3_pallas import site_ok

        # r4 default: only the measured-winner outlier site dispatches
        monkeypatch.delenv("DMF_FUSED_NECK_SITES", raising=False)
        assert site_ok("neck_f1_conv1")
        assert not site_ok("neck_f1_conv0")
        assert not site_ok("neck_f3_conv0")
        monkeypatch.setenv("DMF_FUSED_NECK_SITES",
                           "neck_f1_conv0,neck_f1_conv1")
        assert site_ok("neck_f1_conv1")
        assert not site_ok("neck_f3_conv0")
        # r3 advisor (low): whitespace-tolerant parsing + ''/'all' cases
        monkeypatch.setenv("DMF_FUSED_NECK_SITES",
                           "neck_f1_conv0, neck_f1_conv1")
        assert site_ok("neck_f1_conv1")
        monkeypatch.setenv("DMF_FUSED_NECK_SITES", "")
        assert site_ok("neck_f3_conv0")
        monkeypatch.setenv("DMF_FUSED_NECK_SITES", "ALL")
        assert site_ok("neck_f3_conv0")

    def test_odd_batch_tiles(self, setup):
        # B=3 forces bt=1 whole-map blocks
        s = dict(setup, x=jnp.concatenate(
            [setup["x"], setup["x"][:1] * 0.25]))
        out = conv3x3_bn_gelu(s["x"], s["k"], s["b"], s["g"], s["beta"],
                              s["mu"], s["var"], interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla_ref(s)),
                                   rtol=2e-5, atol=2e-5)

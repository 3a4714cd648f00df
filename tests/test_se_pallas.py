"""Fused SE Pallas kernel parity vs the XLA SEBlock (interpret mode on CPU).

The kernel is the serving fast path for every ResLiteBlock SE
(ops/se_pallas.py; reference model_module.py:25-47) — these tests pin its
numerics against the differentiable XLA route that training uses, and the
dispatch conditions that keep tiny / training-path SEs on XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.models.layers import SEBlock
from dmf_tpu.ops.se_pallas import _batch_tile, enabled, fits_vmem, se_scale


@pytest.fixture
def se_setup():
    C, mid = 128, 64
    model = SEBlock(channels=C, reduction=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 8, 8, C).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


class TestSEKernelParity:
    def test_matches_xla_seblock_fp32(self, se_setup):
        model, variables, x = se_setup
        ref_out, ref_w = model.apply(variables, x)
        p0 = variables["params"]["Dense_0"]
        p1 = variables["params"]["Dense_1"]
        out, w = se_scale(x, p0["kernel"], p0["bias"],
                          p1["kernel"], p1["bias"], interpret=True)
        assert out.shape == ref_out.shape and w.shape == ref_w.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w),
                                   rtol=2e-5, atol=2e-6)

    def test_matches_xla_seblock_bf16(self, se_setup):
        model, variables, x = se_setup
        xb = x.astype(jnp.bfloat16)
        model16 = SEBlock(channels=128, reduction=2, dtype=jnp.bfloat16)
        ref_out, _ = model16.apply(variables, xb)
        p0 = variables["params"]["Dense_0"]
        p1 = variables["params"]["Dense_1"]
        out, _ = se_scale(xb, p0["kernel"], p0["bias"],
                          p1["kernel"], p1["bias"], interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
            rtol=2e-2, atol=2e-3,  # bf16 pool accumulation differs (fp32 here)
        )

    def test_vmem_gate(self):
        assert fits_vmem((8, 32, 32, 512), jnp.bfloat16)
        assert fits_vmem((128, 64, 64, 256), jnp.bfloat16)
        assert not fits_vmem((8, 256, 256, 512), jnp.bfloat16)  # 64 MB block
        assert not fits_vmem((8, 32, 32, 14), jnp.float32)  # lane-misaligned

    def test_fused_flag_on_cpu_stays_on_xla_path(self, se_setup):
        """fused=True must be a silent no-op off-TPU (dispatch requires the
        tpu backend), so CPU tests and CPU serving never hit Mosaic."""
        model, variables, x = se_setup
        a, _ = model.apply(variables, x)
        b, _ = model.apply(variables, x, fused=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_measured_win_gate_defaults_off(self, monkeypatch):
        """Fused dispatch is opt-in (DMF_FUSED_SE=1) until the on-chip
        microbench proves a win — the first-cut kernel regressed serving."""
        monkeypatch.delenv("DMF_FUSED_SE", raising=False)
        assert not enabled()
        monkeypatch.setenv("DMF_FUSED_SE", "1")
        assert enabled()
        monkeypatch.setenv("DMF_FUSED_SE", "0")
        assert not enabled()

    def test_batch_tile_divisor(self):
        """Grid tiles are the largest divisor of B that fits the VMEM
        budget — never a remainder-producing tile."""
        mb = 1024 * 1024
        assert _batch_tile(128, 512 * 1024) == 8   # 4 MB budget / 512 KB
        assert _batch_tile(10, mb) == 2            # 4 fits but 10 % 4 != 0
        assert _batch_tile(6, 32 * 1024) == 6      # whole batch in one tile
        assert _batch_tile(3, 8 * mb) == 1         # over budget -> 1/sample

    def test_fused_under_vmap_interpret(self, se_setup):
        """The MC predictor vmaps the per-pass forward; the custom_vmap
        rule folds the mapped axis into the kernel batch (no sequential
        grid axis) and must match per-slice evaluation."""
        model, variables, x = se_setup
        p0 = variables["params"]["Dense_0"]
        p1 = variables["params"]["Dense_1"]
        xs = jnp.stack([x, x * 0.5])

        def one(xi):
            return se_scale(xi, p0["kernel"], p0["bias"],
                            p1["kernel"], p1["bias"], interpret=True)[0]

        batched = jax.vmap(one)(xs)
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(one(xs[i])),
                rtol=2e-5, atol=2e-6,
            )

"""Fused ResLite epilogue kernel (residual+GELU+dropout+SE) parity tests.

Runs the kernel under Pallas's TPU-semantics interpreter on CPU.  The
interpreter stubs ``prng_random_bits`` to zeros; the kernel's keep-mask is
oriented so stubbed bits mean keep-everything, making the dropout branch
exactly ``undropped/(1-p)`` here — real mask statistics are a TPU-side
measurement (scripts/bench_se.py chain).  See ops/epilogue_pallas.py for
the measured motivation (XLA co-fuses SE pools upstream, so only the whole
epilogue saves HBM traffic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmf_tpu.ops.epilogue_pallas import enabled, fits_vmem, se_epilogue


@pytest.fixture
def setup():
    rng = np.random.RandomState(0)
    B, H, W, C, mid = 4, 8, 8, 128, 64
    return dict(
        x=jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)),
        idn=jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)),
        w1=jnp.asarray(rng.randn(C, mid).astype(np.float32)) * 0.05,
        b1=jnp.asarray(rng.randn(mid).astype(np.float32)) * 0.01,
        w2=jnp.asarray(rng.randn(mid, C).astype(np.float32)) * 0.05,
        b2=jnp.asarray(rng.randn(C).astype(np.float32)) * 0.01,
    )


def xla_ref(s, drop_scale=1.0):
    y = jax.nn.gelu(s["x"] + s["idn"], approximate=False) * drop_scale
    pool = y.mean(axis=(1, 2))
    h = jax.nn.gelu(pool @ s["w1"] + s["b1"], approximate=False)
    scale = jax.nn.sigmoid(h @ s["w2"] + s["b2"])
    return y * scale[:, None, None, :]


class TestEpilogueKernel:
    def test_matches_xla_chain_fp32(self, setup):
        out = se_epilogue(setup["x"], setup["idn"], setup["w1"], setup["b1"],
                          setup["w2"], setup["b2"], interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xla_ref(setup)),
                                   rtol=2e-5, atol=2e-6)

    def test_matches_xla_chain_bf16(self, setup):
        s16 = {k: v.astype(jnp.bfloat16) for k, v in setup.items()}
        out = se_epilogue(s16["x"], s16["idn"], s16["w1"], s16["b1"],
                          s16["w2"], s16["b2"], interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np.asarray(xla_ref(setup), np.float32), rtol=3e-2, atol=5e-3)

    def test_dropout_branch_interpret_stub(self, setup):
        """Stubbed bits => keep-all => exactly undropped/(1-p); pins the
        mask orientation, the 1/(1-p) scaling, and that the pool/SE see the
        POST-dropout map (flax order: Dropout then SEBlock)."""
        p = 0.4
        out = se_epilogue(setup["x"], setup["idn"], setup["w1"], setup["b1"],
                          setup["w2"], setup["b2"], drop_rate=p,
                          rng=jax.random.PRNGKey(3), interpret=True)
        ref = xla_ref(setup, drop_scale=1.0 / (1.0 - p))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_dropout_requires_rng(self, setup):
        with pytest.raises(ValueError, match="requires rng"):
            se_epilogue(setup["x"], setup["idn"], setup["w1"], setup["b1"],
                        setup["w2"], setup["b2"], drop_rate=0.3,
                        interpret=True)

    def test_vmap_folds_pass_axis(self, setup):
        xs = jnp.stack([setup["x"], setup["x"] * 0.5])
        ids = jnp.stack([setup["idn"], setup["idn"]])

        def one(xi, ii):
            return se_epilogue(xi, ii, setup["w1"], setup["b1"],
                               setup["w2"], setup["b2"], interpret=True)

        batched = jax.vmap(one)(xs, ids)
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(one(xs[i], ids[i])),
                rtol=2e-5, atol=2e-6)

    def test_vmap_unbatched_identity_folds(self, setup):
        """The MC predictor hoists the deterministic prefix out of the
        pass vmap, so the block's residual input arrives unbatched; the
        vmap rule must broadcast+fold (one fused grid), not serialize a
        lax.map per pass — and stay numerically exact."""
        xs = jnp.stack([setup["x"], setup["x"] * 0.5, -setup["x"]])

        def one(xi):
            return se_epilogue(xi, setup["idn"], setup["w1"], setup["b1"],
                               setup["w2"], setup["b2"], interpret=True)

        jaxpr = jax.make_jaxpr(jax.vmap(one))(xs)
        assert "while" not in str(jaxpr)  # no lax.map fallback
        batched = jax.vmap(one)(xs)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(one(xs[i])),
                rtol=2e-5, atol=2e-6)

    def test_vmap_with_per_pass_rngs_runs_deterministically(self, setup):
        """The MC predictor shape: vmap over dropout keys (batched seeds
        fold into one tile-salted stream)."""
        keys = jax.random.split(jax.random.PRNGKey(0), 3)

        def one(k):
            return se_epilogue(setup["x"], setup["idn"], setup["w1"],
                               setup["b1"], setup["w2"], setup["b2"],
                               drop_rate=0.3, rng=k, interpret=True)

        a = jax.vmap(one)(keys)
        b = jax.vmap(one)(keys)
        assert a.shape == (3,) + setup["x"].shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("t", ["1", "0"])
    def test_both_variants_match(self, setup, monkeypatch, t):
        """DMF_FUSED_EPILOGUE_T selects the layout-matched (H,W,B,C)
        kernel (default) or the (B,H,W,C) one; identical numerics either
        way, incl. under vmap and the dropout interpret stub."""
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_T", t)
        ref = xla_ref(setup)
        out = se_epilogue(setup["x"], setup["idn"], setup["w1"], setup["b1"],
                          setup["w2"], setup["b2"], interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
        p = 0.4
        outd = se_epilogue(setup["x"], setup["idn"], setup["w1"],
                           setup["b1"], setup["w2"], setup["b2"],
                           drop_rate=p, rng=jax.random.PRNGKey(3),
                           interpret=True)
        np.testing.assert_allclose(
            np.asarray(outd),
            np.asarray(xla_ref(setup, drop_scale=1.0 / (1.0 - p))),
            rtol=2e-5, atol=2e-6)
        xs = jnp.stack([setup["x"], setup["x"] * 0.5])
        ids = jnp.stack([setup["idn"], setup["idn"]])
        batched = jax.vmap(lambda xi, ii: se_epilogue(
            xi, ii, setup["w1"], setup["b1"], setup["w2"], setup["b2"],
            interpret=True))(xs, ids)
        np.testing.assert_allclose(np.asarray(batched[1]),
                                   np.asarray(xla_ref(
                                       dict(setup, x=setup["x"] * 0.5))),
                                   rtol=2e-5, atol=2e-6)

    def test_transposed_batch_tile(self):
        from dmf_tpu.ops.epilogue_pallas import _batch_tile_t

        # multiple-of-8 batches get sublane-full multiple-of-8 tiles
        assert _batch_tile_t(1152, 512 * 1024) == 16
        assert _batch_tile_t(1152, 2 * 1024) % 8 == 0
        # Mosaic forbids sublane-partial tiles: non-multiple-of-8 batches
        # go whole-batch (bt == B is always legal)
        assert _batch_tile_t(4, 1024) == 4
        # the floor is one 8-sample block; se_epilogue only dispatches the
        # variant when that fits the budget
        assert _batch_tile_t(8, 16 * 1024 * 1024) == 8
        # the drop-free path shrinks the budget (VMEM spill headroom)
        assert _batch_tile_t(128, 256 * 1024, budget=2 * 1024 * 1024) == 8

    def test_drop_free_budget_excludes_oversized_blocks(self):
        """Pin the dispatch predicate that fixed the measured fp B=128
        compile OOM: a drop-free 32x32x256-fp32 site (1 MB/sample) must
        NOT qualify for the transposed kernel under the 2 MB budget
        (an 8-sample block would be 8 MB and the lowering forbids the
        sublane-partial alternative), while the MC-path 8 MB budget still
        admits every flagship bf16 site."""
        from dmf_tpu.ops import epilogue_pallas as ep

        assert 8 * (32 * 32 * 256 * 4) > ep._VMEM_BLOCK_LIMIT
        for h, w, c in ((64, 64, 128), (32, 32, 256), (16, 16, 512)):
            assert 8 * (h * w * c * 2) <= ep._VMEM_BLOCK_LIMIT_T

    def test_eval_gate_default_off(self, monkeypatch):
        # the drop-free eval dispatch measured an e2e LOSS (741 vs 766-771
        # vol/s — XLA co-fuses the eval chain into the preceding conv), so
        # it must stay opt-in regardless of backend
        from dmf_tpu.ops.epilogue_pallas import enabled_eval

        monkeypatch.delenv("DMF_FUSED_EPILOGUE_EVAL", raising=False)
        assert not enabled_eval()
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_EVAL", "1")
        assert enabled_eval()
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_EVAL", "0")
        assert not enabled_eval()

    def test_gate_and_vmem(self, monkeypatch):
        # default: ON only for single-device TPU (measured win); here the
        # backend is CPU so the default resolves off
        monkeypatch.delenv("DMF_FUSED_EPILOGUE", raising=False)
        assert not enabled()
        monkeypatch.setenv("DMF_FUSED_EPILOGUE", "1")
        assert enabled()
        monkeypatch.setenv("DMF_FUSED_EPILOGUE", "0")
        assert not enabled()
        assert fits_vmem((8, 32, 32, 512), jnp.bfloat16)
        assert not fits_vmem((8, 32, 32, 514), jnp.bfloat16)  # lane-misaligned
        # odd tail batches can't take the layout-matched variant (batch
        # must tile by 8) but stay eligible via the (B,H,W,C) kernel
        assert fits_vmem((30, 32, 32, 256), jnp.bfloat16)

    def test_channel_allowlist(self, monkeypatch):
        # per-site sweep (module docstring): with the layout-matched
        # kernel (default) every site wins -> unset allows all; the
        # (B,H,W,C) kernel pays a boundary relayout tax -> unset
        # restricts to the measured {512} winner; "all"/comma-list/junk
        # override as documented
        from dmf_tpu.ops.epilogue_pallas import channel_allowed

        monkeypatch.delenv("DMF_FUSED_EPILOGUE_CH", raising=False)
        monkeypatch.delenv("DMF_FUSED_EPILOGUE_T", raising=False)
        assert channel_allowed(512) and channel_allowed(128)
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_T", "0")
        assert channel_allowed(512)
        assert not channel_allowed(128)
        assert not channel_allowed(256)
        assert not channel_allowed(768)
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_CH", "all")
        assert channel_allowed(128) and channel_allowed(768)
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_CH", "128, 512")
        assert channel_allowed(128) and channel_allowed(512)
        assert not channel_allowed(256)
        monkeypatch.setenv("DMF_FUSED_EPILOGUE_CH", "not-a-number")
        assert channel_allowed(256)


class TestShardMap:
    def test_kernel_runs_per_shard_under_shard_map(self, setup):
        """The DP serving path (evals/predict.py::_shard_map_predictor)
        runs the kernel inside a shard_map body — each shard executes it on
        its local batch and the assembled result equals the global run."""
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

        def local(x, i):
            return se_epilogue(x, i, setup["w1"], setup["b1"],
                               setup["w2"], setup["b2"], interpret=True)

        # check_vma=False: pallas_call carries no varying-mesh-axes
        # metadata (same setting the serving predictor uses)
        sharded = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False,
        ))
        out = sharded(setup["x"], setup["idn"])
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(local(setup["x"], setup["idn"])),
            rtol=2e-5, atol=2e-6)

    def test_shard_local_dispatch_flag(self):
        from dmf_tpu.ops import epilogue_pallas as ep

        assert not ep._SHARD_LOCAL.get()
        with ep.shard_local_dispatch():
            assert ep._SHARD_LOCAL.get()
        assert not ep._SHARD_LOCAL.get()


class TestModelDispatch:
    def test_cpu_serving_ignores_gate(self, monkeypatch):
        """DMF_FUSED_EPILOGUE=1 must be a silent no-op off-TPU."""
        from dmf_tpu.models.layers import ResLiteBlock

        block = ResLiteBlock(in_ch=16, out_ch=32, use_se=True, recon_ch=1,
                             dropout=0.3)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16),
                        jnp.float32)
        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        variables = block.init(k, x, train=False)
        a, _ = block.apply(variables, x, train=False)
        monkeypatch.setenv("DMF_FUSED_EPILOGUE", "1")
        b, _ = block.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

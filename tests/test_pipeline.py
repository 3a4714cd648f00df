"""End-to-end pipeline test: prepare -> train both modalities -> fusion ->
TTA x MC test, on synthetic data with tiny shapes (the reference driver loop,
run.py:121-180, including the fusion stage it ships commented out)."""

import dataclasses
import os

import numpy as np
import pytest

from dmf_tpu.config import default_parameters


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("store"))
    cfg = default_parameters(
        batch_size=8, mc_passes=2, base_path=base, segnum=4, patience=50,
        unfreeze_timer=1,
    )

    def small(mc):
        return dataclasses.replace(
            mc, channels=(8, 16, 32), input_size=32, use_backbone=False,
            proj_dim=8, dropout=0.1,
        )

    fs = dataclasses.replace(
        cfg.fusion_model.fusion_specific, fusion_channels=16,
        dwi_out_channels=32, dce_out_channels=32,
    )
    return cfg.replace(
        dwi_model=small(cfg.dwi_model),
        dce_model=small(cfg.dce_model),
        fusion_model=dataclasses.replace(small(cfg.fusion_model),
                                         fusion_specific=fs),
    )


@pytest.fixture(scope="module")
def single_results(tiny_cfg, tmp_path_factory):
    from dmf_tpu.pipeline import run_single_model

    results_dir = str(tmp_path_factory.mktemp("results"))
    out = {}
    for method in ("dwi", "dce"):
        out[method] = run_single_model(
            tiny_cfg, method, fold=0, num_epochs=2, min_epochs=1,
            base_dir=results_dir,
        )
    return results_dir, out


class TestSinglePipeline:
    def test_metrics_written(self, single_results):
        results_dir, out = single_results
        for method in ("dwi", "dce"):
            assert os.path.exists(
                os.path.join(results_dir, method, "fold_0", "metrics.json")
            )
            tm = out[method]["test_metrics"]
            assert "test_acc" in tm and "test_roc_auc" in tm
            assert "test_uncertainty_mean" in tm  # tta_mc default
            assert np.isfinite(tm["test_roc_auc"])

    def test_processed_splits_cached(self, single_results, tiny_cfg):
        for method in ("dwi", "dce"):
            for split in ("train", "val", "test"):
                p = os.path.join(tiny_cfg.base_path, "processed",
                                 f"{method}0{split}data.npz")
                assert os.path.exists(p), p

    def test_dwi_channel_count_includes_adc(self, single_results, tiny_cfg):
        from dmf_tpu.pipeline import load_processed_split

        d = load_processed_split(
            os.path.join(tiny_cfg.base_path, "processed", "dwi0traindata")
        )
        assert d["imgs"].shape[-1] == tiny_cfg.dwi_channel_num  # 13 + ADC
        assert "masks" in d and "labels" in d

    def test_modality_attention_collected(self, single_results):
        _, out = single_results
        assert out["dwi"]["modality_attention"] is not None


class TestFusionPipeline:
    def test_fusion_end_to_end(self, single_results, tiny_cfg, tmp_path_factory):
        from dmf_tpu.pipeline import run_fusion_model

        results_dir, out = single_results
        fusion = run_fusion_model(
            tiny_cfg, 0, out["dwi"], out["dce"], num_epochs=2, min_epochs=1,
            base_dir=results_dir,
        )
        tm = fusion["test_metrics"]
        assert np.isfinite(tm["test_roc_auc"])
        assert fusion["modality_attention"] is not None
        assert os.path.exists(
            os.path.join(results_dir, "fusion", "fold_0", "metrics.json")
        )
        # per-fold combined params store
        assert os.path.exists(
            os.path.join(results_dir, "fusion", "fold_0", "checkpoints",
                         "fusion_fold0.msgpack")
        )


class TestCheckpointRoundtrip:
    def test_best_restore(self, tiny_cfg, single_results):
        import jax
        from dmf_tpu.utils import BestCheckpointer, restore_pytree

        results_dir, out = single_results
        state = out["dwi"]["state"]
        ckpt_dir = os.path.join(results_dir, "dwi", "fold_0", "checkpoints")
        restored = restore_pytree(
            os.path.join(ckpt_dir, "best"), jax.device_get(state)
        )
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(restored.params)
        assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))

    def test_resume_checkpoint_exists(self, tiny_cfg, single_results):
        # RollingSaver writes an orbax dir 'last' (async) or 'last.msgpack'
        # (fallback); load_checkpoint restores either
        results_dir, _ = single_results
        base = os.path.join(results_dir, "dwi", "fold_0", "checkpoints", "last")
        assert os.path.isdir(base) or os.path.exists(base + ".msgpack")

    def test_restore_accepts_explicit_msgpack_suffix(self, single_results):
        """Regression: users pass the filename they can see on disk
        ('best.msgpack'), not the save stem ('best')."""
        import jax
        from dmf_tpu.utils.checkpoint import load_checkpoint

        results_dir, out = single_results
        state = jax.device_get(out["dwi"]["state"])
        path = os.path.join(results_dir, "dwi", "fold_0", "checkpoints",
                            "best.msgpack")
        restored = load_checkpoint(path, state)
        assert restored.params is not None

    def test_rolling_saver_roundtrip(self, tiny_cfg, single_results, tmp_path):
        import jax
        from dmf_tpu.utils.checkpoint import RollingSaver, load_checkpoint

        _, out = single_results
        state = jax.device_get(out["dwi"]["state"])
        roll = RollingSaver(str(tmp_path))
        roll.save(state)
        roll.wait()
        restored = load_checkpoint(str(tmp_path / "last"), state)
        a = jax.tree.leaves(state.params)
        b = jax.tree.leaves(restored.params)
        assert all(np.allclose(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))
        # rolling overwrite must be valid too
        roll.save(restored)
        roll.wait()
        load_checkpoint(str(tmp_path / "last"), state)


class TestTorchStoreLoader:
    def test_pth_roundtrip(self, tiny_cfg, tmp_path):
        import torch

        from dmf_tpu.pipeline import load_raw_tensors

        base = str(tmp_path / "store")
        os.makedirs(os.path.join(base, "masks"), exist_ok=True)
        rng = np.random.RandomState(0)
        n = 6
        dwi = rng.rand(n, 13, 16, 16).astype(np.float32)  # reference NCHW
        labels = rng.randint(0, 4, n)
        torch.save(torch.tensor(dwi), os.path.join(base, "dwi_tensordata.pth"))
        torch.save(torch.tensor(dwi[:2]),
                   os.path.join(base, "dwi_test_tensordata.pth"))
        torch.save(torch.tensor(labels),
                   os.path.join(base, "labels_tensordata.pth"))
        torch.save(torch.tensor(labels[:2]),
                   os.path.join(base, "labels_test_tensordata.pth"))
        torch.save(torch.tensor(rng.rand(n, 1, 16, 16).astype(np.float32)),
                   os.path.join(base, "masks", "mask.pth"))

        cfg = tiny_cfg.replace(base_path=base)
        raw = load_raw_tensors(cfg, "dwi")
        assert raw["imgs"].shape == (n, 16, 16, 13)  # transposed to NHWC
        assert raw["masks"].shape == (n, 16, 16, 1)
        assert np.allclose(raw["imgs"][0, :, :, 0], dwi[0, 0])

    def test_reference_nested_layout(self, tiny_cfg, tmp_path):
        """The reference archive nests each store in its own directory
        (parameters_generate.py:290-296) — must load unmodified."""
        import torch

        from dmf_tpu.pipeline import load_raw_tensors

        base = str(tmp_path / "archive")
        rng = np.random.RandomState(1)
        n = 5
        dce = rng.rand(n, 6, 16, 16).astype(np.float32)
        labels = rng.randint(0, 4, n)
        for stem, arr in (
            ("dce_tensordata", torch.tensor(dce)),
            ("dce_test_tensordata", torch.tensor(dce[:2])),
            ("labels_tensordata", torch.tensor(labels)),
            ("labels_test_tensordata", torch.tensor(labels[:2])),
        ):
            os.makedirs(os.path.join(base, stem), exist_ok=True)
            torch.save(arr, os.path.join(base, stem, f"{stem}.pth"))
        os.makedirs(os.path.join(base, "masks"), exist_ok=True)
        torch.save(torch.tensor(rng.rand(n, 1, 16, 16).astype(np.float32)),
                   os.path.join(base, "masks", "mask.pth"))

        raw = load_raw_tensors(tiny_cfg.replace(base_path=base), "dce")
        assert raw["imgs"].shape == (n, 16, 16, 6)
        assert raw["test_labels"].shape == (2,)
        assert np.allclose(raw["imgs"][0, :, :, 0], dce[0, 0])


class TestInt8ServingPath:
    def test_fusion_model_test_int8(self, tiny_cfg):
        """fusion_model_test(int8=True): the PTQ serving path through the
        user-facing pipeline API, metrics close to the fp path."""
        import jax
        import jax.numpy as jnp

        from dmf_tpu.models import Encoder
        from dmf_tpu.pipeline.run_fusion import (
            build_fusion_state,
            fusion_model_test,
        )
        from dmf_tpu.train import TrainState, adamw_init

        cfg = tiny_cfg
        rng = np.random.RandomState(0)

        def make_encoder(method, ch):
            enc = Encoder(method=method, config=cfg.model_config(method),
                          channel_num=ch, num_classes=cfg.class_num)
            x = jnp.zeros((1, 32, 32, ch))
            v = enc.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, train=False)
            st = TrainState(params=v["params"],
                            batch_stats=v.get("batch_stats", {}),
                            opt_state=adamw_init(v["params"]),
                            step=jnp.zeros((), jnp.int32))
            return enc, st

        dwi, dwi_st = make_encoder("dwi", cfg.dwi_channel_num)
        dce, dce_st = make_encoder("dce", cfg.dce_channel_num)
        fusion, state = build_fusion_state(cfg, dwi, dwi_st, dce, dce_st)

        test_data = {
            "dwi": rng.rand(10, 32, 32, cfg.dwi_channel_num).astype(np.float32),
            "dce": rng.rand(10, 32, 32, cfg.dce_channel_num).astype(np.float32),
            "labels": (np.arange(10) % cfg.class_num).astype(np.int64),
        }
        fp = fusion_model_test(cfg, dwi, dce, fusion, state, test_data)
        q = fusion_model_test(cfg, dwi, dce, fusion, state, test_data,
                              int8=True)
        assert set(q["metrics"]) == set(fp["metrics"])
        # untrained nets, random data: probabilities should still be close
        assert np.abs(q["probs"] - fp["probs"]).max() < 0.1


class TestNoCompatADC:
    def test_per_sample_adc_path(self, tiny_cfg):
        """reference_compat=False: per-sample ADC maps travel with their
        samples through the splits (regression: the val split used to get
        no map and train an unsliced full-dataset stack)."""
        from dmf_tpu.pipeline.prepare_single import prepare_single_data

        cfg = tiny_cfg.replace(reference_compat=False)
        data = prepare_single_data(cfg, "dwi", fold=0)
        for split in ("train", "val", "test"):
            arrays = data.splits[split]
            adc = arrays.get("adc")
            assert adc is not None, split
            assert len(adc) == len(arrays["imgs"]), split
            assert adc.shape[-1] == 1
        # the processor consumes per-batch maps and emits 14-channel output
        import jax

        proc = data.processors_by_split["train"]
        tr = data.splits["train"]
        out = proc.train_batch(jax.random.PRNGKey(0), tr["imgs"][:4],
                               adc=tr["adc"][:4])
        assert out.shape[-1] == tiny_cfg.dwi_channel_num
        ev = proc.eval_batch(tr["imgs"][:4], adc=tr["adc"][:4])
        assert ev.shape[-1] == tiny_cfg.dwi_channel_num
        # chunked whole-split preprocessing must equal the one-shot path
        # (incl. an uneven tail chunk that exercises the pad+slice)
        ev_chunked = proc.eval_split(tr["imgs"][:4], adc=tr["adc"][:4],
                                     chunk=3)
        np.testing.assert_allclose(np.asarray(ev), ev_chunked,
                                   rtol=1e-6, atol=1e-6)


class TestMultifoldPipeline:
    """The fold-parallel PRODUCT path (cli.py run --parallel-folds ->
    run_single_model_multifold): per-fold results must match the
    sequential product path (run.py:121-163's loop, which the vmapped
    program replaces), and every per-fold artifact must land on disk."""

    def test_fold_parallel_matches_sequential(self, tiny_cfg, single_results,
                                              tmp_path_factory):
        from dmf_tpu.pipeline.run_single import run_single_model_multifold

        _, out = single_results
        mf_dir = str(tmp_path_factory.mktemp("results_mf"))
        mf = run_single_model_multifold(
            tiny_cfg, "dwi", [0, 1], num_epochs=2, min_epochs=1,
            base_dir=mf_dir, export_splits=False,
        )
        assert set(mf) == {0, 1}

        # fold 0 must reproduce the sequential product path (vmap float
        # reassociation tolerance, as in tests/test_multifold_loop.py)
        seq = out["dwi"]
        np.testing.assert_allclose(
            np.asarray(mf[0]["test_probs"]), np.asarray(seq["test_probs"]),
            rtol=2e-4, atol=1e-5)
        for k, v in seq["test_metrics"].items():
            np.testing.assert_allclose(
                mf[0]["test_metrics"][k], v, rtol=2e-4, atol=1e-6,
                err_msg=k)

        # per-fold artifacts: metrics json + best checkpoint per fold
        for f in (0, 1):
            root = os.path.join(mf_dir, "dwi", f"fold_{f}")
            assert os.path.exists(os.path.join(root, "metrics.json")), f
            assert os.path.exists(
                os.path.join(root, "checkpoints", "best.msgpack")), f

        # fold 1 trains on a different split: genuinely different output
        assert not np.allclose(np.asarray(mf[1]["test_probs"])[:4],
                               np.asarray(mf[0]["test_probs"])[:4])

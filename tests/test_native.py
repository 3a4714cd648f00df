"""Native host runtime (C++/ctypes) parity and availability tests."""

import numpy as np
import pytest

from dmf_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return native.load()


class TestNative:
    def test_percentiles_match_numpy(self, lib, rng):
        data = rng.randn(10000).astype(np.float32)
        q = np.array([1, 10, 25, 50, 75, 90, 99], np.float64)
        ours = native.percentiles(data, q)
        ref = np.percentile(data, q)
        assert np.allclose(ours, ref, atol=1e-5)

    def test_nyul_fit_matches_numpy(self, lib, rng):
        imgs = rng.rand(5, 32, 32, 3).astype(np.float32)
        q = np.array([1, 10, 25, 30, 40, 50, 60, 75, 80, 90, 99], np.float64)
        ours = native.nyul_fit(imgs, q)
        flat = imgs.reshape(5, -1, 3)
        ref = np.percentile(flat, q, axis=1).mean(axis=1).T
        assert np.allclose(ours, ref, atol=1e-5)

    def test_nyul_standardizer_uses_native(self, lib, rng):
        from dmf_tpu.data import NyulStandardizer

        imgs = rng.rand(4, 16, 16, 2).astype(np.float32)
        ny = NyulStandardizer()
        ny.fit(imgs)
        flat = imgs.reshape(4, -1, 2)
        ref = np.percentile(flat, ny.landmarks, axis=1).mean(axis=1).T
        assert np.allclose(ny.channel_landmarks, ref, atol=1e-5)

    def test_gather_rows_matches_fancy_indexing(self, lib, rng):
        src = rng.rand(100, 8, 8, 3).astype(np.float32)
        idx = rng.randint(0, 100, 32)
        ours = native.gather_rows(src, idx)
        assert np.array_equal(ours, src[idx])

    def test_gather_empty(self, lib):
        src = np.zeros((4, 2), np.float32)
        out = native.gather_rows(src, np.zeros(0, np.int64))
        assert out.shape == (0, 2)


class TestNativeBatchLoader:
    def _make(self, n=37, batch=8, **kw):
        from dmf_tpu.utils.native import NativeBatchLoader

        imgs = np.zeros((n, 4, 4, 2), np.float32)
        imgs[:, 0, 0, 0] = np.arange(n)  # encode sample id in the data
        masks = np.zeros((n, 2, 2, 1), np.float32)
        masks[:, 0, 0, 0] = np.arange(n)
        labels = np.arange(n, dtype=np.int32)
        return NativeBatchLoader({"imgs": imgs, "masks": masks}, labels,
                                 batch, **kw)

    def test_epoch_covers_every_sample_once(self):
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        ld = self._make(shuffle=True, seed=3)
        seen, sizes = [], []
        for b in ld:
            ids = b["imgs"][:, 0, 0, 0].astype(int)
            # imgs / masks / labels rows must stay aligned
            assert np.array_equal(ids, b["labels"])
            assert np.array_equal(ids, b["masks"][:, 0, 0, 0].astype(int))
            seen.extend(ids.tolist())
            sizes.append(len(ids))
        assert sorted(seen) == list(range(37))
        assert sizes == [8] * 4 + [5]  # drop_last=False keeps the tail
        ld.close()

    def test_reshuffle_differs_across_epochs(self):
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        ld = self._make(n=64, batch=16, shuffle=True, seed=0)
        e0 = [int(i) for b in ld for i in b["imgs"][:, 0, 0, 0]]
        ld.new_epoch(seed=1)
        e1 = [int(i) for b in ld for i in b["imgs"][:, 0, 0, 0]]
        assert sorted(e0) == sorted(e1) == list(range(64))
        assert e0 != e1
        ld.close()

    def test_unshuffled_order_and_drop_last(self):
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        ld = self._make(n=20, batch=8, shuffle=False, seed=0, drop_last=True)
        got = [b["imgs"][:, 0, 0, 0].astype(int).tolist() for b in ld]
        assert got == [list(range(0, 8)), list(range(8, 16))]
        ld.close()

    def test_fusion_shaped_batches(self):
        """Four aligned arrays (dwi, dce, masks, labels) — the fusion
        pipeline's batch layout (prepare_fusion_model.py:88-113)."""
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        n = 23
        dwi = np.zeros((n, 3, 3, 4), np.float32)
        dce = np.zeros((n, 3, 3, 2), np.float32)
        masks = np.zeros((n, 2, 2, 1), np.float32)
        dwi[:, 0, 0, 0] = np.arange(n)
        dce[:, 0, 0, 0] = np.arange(n) * 10
        masks[:, 0, 0, 0] = np.arange(n)
        labels = np.arange(n, dtype=np.int32)
        ld = NativeBatchLoader({"dwi": dwi, "dce": dce, "masks": masks},
                               labels, batch=6, shuffle=True, seed=9)
        total = 0
        for b in ld:
            ids = b["dwi"][:, 0, 0, 0].astype(int)
            assert np.array_equal(b["dce"][:, 0, 0, 0].astype(int), ids * 10)
            assert np.array_equal(b["labels"], ids)
            assert b["dwi"].shape[1:] == (3, 3, 4)
            assert b["dce"].shape[1:] == (3, 3, 2)
            total += len(ids)
        assert total == n
        ld.close()

    def test_many_epochs_stress(self):
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        ld = self._make(n=100, batch=7, shuffle=True, seed=0, ring_slots=3,
                        n_threads=8)
        for ep in range(5):
            if ep:
                ld.new_epoch(seed=ep)
            total = sum(len(b["labels"]) for b in ld)
            assert total == 100
        ld.close()


class TestNativeIterateBatches:
    def test_matches_python_path_contract(self):
        """iterate_batches(native=True) honors the same contract: static
        shapes, tail padding, valid mask, full coverage."""
        from dmf_tpu.data.pipeline import ArrayDataset, iterate_batches
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        n, b = 21, 8
        imgs = np.zeros((n, 4, 4, 2), np.float32)
        imgs[:, 0, 0, 0] = np.arange(n)
        labels = np.arange(n, dtype=np.int32)
        ds = ArrayDataset(imgs=imgs, labels=labels)

        seen, n_valid = [], 0
        for batch in iterate_batches(ds, b, shuffle=True,
                                     rng=np.random.RandomState(0),
                                     native=True):
            assert batch["imgs"].shape == (b, 4, 4, 2)  # static shapes
            assert batch["valid"].shape == (b,)
            v = np.asarray(batch["valid"]).astype(bool)
            ids = np.asarray(batch["imgs"])[:, 0, 0, 0].astype(int)
            assert np.array_equal(np.asarray(batch["labels"])[v], ids[v])
            seen.extend(ids[v].tolist())
            n_valid += int(v.sum())
        assert sorted(seen) == list(range(n))
        assert n_valid == n

    def test_early_break_and_close_is_safe(self):
        """Regression: breaking out of iteration and closing the loader
        must not release a slot into a destroyed loader (NULL deref)."""
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        imgs = np.zeros((64, 4, 4, 1), np.float32)
        ld = NativeBatchLoader({"imgs": imgs}, None, 8, shuffle=True, seed=0)
        it = iter(ld)
        next(it)
        ld.close()          # destroy while the generator is suspended
        del it              # generator finalizer must not touch the loader

    def test_stale_generator_release_ignored_after_new_epoch(self):
        """Regression: a generator abandoned mid-epoch and finalized AFTER
        new_epoch() must not loader_release() a slot the new epoch's workers
        may already have re-claimed (generation guard in NativeBatchLoader)."""
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        imgs = np.zeros((64, 4, 4, 1), np.float32)
        imgs[:, 0, 0, 0] = np.arange(64)
        ld = NativeBatchLoader({"imgs": imgs}, None, 8, shuffle=True, seed=0)
        it = iter(ld)
        next(it)            # holds a slot, generator suspended
        ld.new_epoch(seed=1)
        del it              # finalizer fires post-reseed: must be a no-op
        seen = [int(i) for b in ld for i in b["imgs"][:, 0, 0, 0]]
        assert sorted(seen) == list(range(64))  # full epoch, no lost batch
        ld.close()

    def test_loader_reused_across_epochs_in_iterate_batches(self):
        """The pipeline caches the native loader on the dataset and reseeds
        it per epoch instead of rebuilding ring buffers + threads."""
        from dmf_tpu.data.pipeline import ArrayDataset, iterate_batches
        from dmf_tpu.utils.native import NativeBatchLoader

        if not NativeBatchLoader.available():
            pytest.skip("native lib unavailable")
        imgs = np.zeros((20, 4, 4, 1), np.float32)
        imgs[:, 0, 0, 0] = np.arange(20)
        ds = ArrayDataset(imgs=imgs, labels=np.arange(20, dtype=np.int32))
        rng = np.random.RandomState(0)
        for _ in range(3):
            ids = []
            for b in iterate_batches(ds, 8, shuffle=True, rng=rng,
                                     native=True):
                v = np.asarray(b["valid"]).astype(bool)
                ids.extend(np.asarray(b["imgs"])[v, 0, 0, 0].astype(int))
            assert sorted(ids) == list(range(20))
        assert hasattr(ds, "_native_loader")
        ds._native_loader[1].close()

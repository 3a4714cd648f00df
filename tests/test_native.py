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

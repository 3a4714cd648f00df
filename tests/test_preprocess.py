"""Preprocessing parity tests vs torch/numpy oracles implementing the
reference formulas (dataset.py:9-41, preprocess_helpers.py:27-167)."""

import numpy as np
import torch
import jax.numpy as jnp

from dmf_tpu.data import (
    NyulStandardizer,
    compute_adc_map,
    dce_global_max_normalize,
    dwi_normalize,
    preprocess_adc,
    zero_to_one_adc,
)
from dmf_tpu.ops import resize_nearest


class TestDWINormalize:
    def test_matches_reference(self, rng):
        img = rng.rand(16, 16, 5).astype(np.float32) * 10
        ours = np.asarray(dwi_normalize(jnp.asarray(img), skip_last=True))
        # torch oracle, per-channel (dataset.py:14-41), CHW
        x = torch.tensor(img).permute(2, 0, 1)
        out = torch.zeros_like(x)
        for ch in range(4):  # skip last (ADC)
            v = x[ch]
            m, s = v.mean(), v.std().clamp(min=1e-6)
            v = ((v - m) / s).clamp(-3, 3)
            out[ch] = (v + 3) / 6
        ref = out.permute(1, 2, 0).numpy()
        assert np.allclose(ours[..., :4], ref[..., :4], atol=2e-5)
        # last channel passes through
        assert np.allclose(ours[..., 4], img[..., 4])

    def test_batched(self, rng):
        imgs = rng.rand(3, 8, 8, 4).astype(np.float32)
        batched = np.asarray(dwi_normalize(jnp.asarray(imgs)))
        single = np.stack(
            [np.asarray(dwi_normalize(jnp.asarray(i))) for i in imgs]
        )
        assert np.allclose(batched, single, atol=1e-6)


class TestADC:
    def test_matches_reference(self, rng):
        img = (rng.rand(8, 8, 13) + 0.1).astype(np.float32)
        bvals = list(range(13))
        ours = np.asarray(compute_adc_map(jnp.asarray(img), bvals))
        # torch oracle (preprocess_helpers.py:133-167), CHW
        x = torch.tensor(img).permute(2, 0, 1)
        b = torch.tensor(bvals, dtype=torch.float32).view(13, 1, 1)
        logS = torch.log(x.clamp(min=1e-6))
        mb = b.mean()
        mls = logS.mean(dim=0)
        cov = ((b - mb) * (logS - mls)).sum(dim=0)
        var = ((b - mb) ** 2).sum()
        ref = (-(cov / (var + 1e-6))).unsqueeze(-1).numpy()
        assert np.allclose(ours, ref, atol=1e-5)

    def test_preprocess_and_rescale(self, rng):
        adc = rng.randn(8, 8, 1).astype(np.float32) * 1e-3
        p = np.asarray(preprocess_adc(jnp.asarray(adc)))
        assert p.min() >= 0 and p.max() <= 1
        z = np.asarray(zero_to_one_adc(jnp.asarray(p), 0.1, 0.9))
        assert z.min() >= 0 and z.max() <= 1


class TestDCE:
    def test_global_max(self, rng):
        imgs = rng.rand(4, 8, 8, 6).astype(np.float32) * 100
        out = np.asarray(dce_global_max_normalize(jnp.asarray(imgs)))
        for i in range(4):
            assert abs(out[i].max() - 1.0) < 1e-5


class TestNyul:
    def test_fit_transform_matches_reference(self, rng):
        imgs = rng.rand(6, 16, 16, 3).astype(np.float32)
        ny = NyulStandardizer()
        ny.fit(imgs)
        ours = np.asarray(ny.transform(jnp.asarray(imgs[0])))

        # numpy oracle (preprocess_helpers.py:52-120), CHW layout
        landmarks = [1, 10, 25, 30, 40, 50, 60, 75, 80, 90, 99]
        std_scale = np.linspace(0, 1, len(landmarks))
        chw = imgs.transpose(0, 3, 1, 2)
        ch_lm = {
            c: np.mean(
                [np.percentile(im[c].flatten(), landmarks) for im in chw], axis=0
            )
            for c in range(3)
        }
        x = chw[0]
        ref = np.zeros_like(x)
        for c in range(3):
            orig = np.percentile(x[c].flatten(), landmarks)
            mid = np.interp(x[c].flatten(), orig, ch_lm[c])
            mid = np.interp(mid, ch_lm[c], std_scale)
            ref[c] = mid.reshape(x[c].shape)
        assert np.allclose(ours, ref.transpose(1, 2, 0), atol=2e-4)

    def test_save_load_roundtrip(self, rng, tmp_path):
        imgs = rng.rand(4, 8, 8, 2).astype(np.float32)
        ny = NyulStandardizer()
        ny.fit(imgs)
        p = str(tmp_path / "nyul.npy")
        ny.save(p)
        ny2 = NyulStandardizer()
        ny2.load(p)
        a = np.asarray(ny.transform(jnp.asarray(imgs[1])))
        b = np.asarray(ny2.transform(jnp.asarray(imgs[1])))
        assert np.allclose(a, b)

    def test_batched_transform(self, rng):
        imgs = rng.rand(4, 8, 8, 2).astype(np.float32)
        ny = NyulStandardizer()
        ny.fit(imgs)
        batched = np.asarray(ny.transform(jnp.asarray(imgs)))
        single = np.stack([np.asarray(ny.transform(jnp.asarray(i))) for i in imgs])
        assert np.allclose(batched, single, atol=1e-6)

    def test_percentile_stride_close_to_exact(self, rng):
        """Serving fast path: landmark percentiles from every 4th pixel
        (data/preprocess.py::nyul_transform_fast percentile_stride) stay
        within ~1-2% of the exact estimator at the serving pixel count
        (measured 0.0105 max output delta here; e2e class-prob error 0.003
        through the full fusion model, bench.py --nyul-stride line)."""
        from dmf_tpu.data import nyul_transform_fast

        # structured (smooth + blob) volume, 256^2 like serving
        y, x = np.mgrid[0:256, 0:256] / 256.0
        base = (np.sin(x * 7) * np.cos(y * 5) * 0.3 + 0.5)[..., None]
        img = (base + rng.rand(256, 256, 3) * 0.2).astype(np.float32)
        lm = jnp.asarray([1, 10, 25, 30, 40, 50, 60, 75, 80, 90, 99],
                         jnp.float32)
        scale = jnp.linspace(0.0, 1.0, 11)
        cl = jnp.tile(scale[None, :], (3, 1))
        exact = np.asarray(nyul_transform_fast(jnp.asarray(img), cl, lm, scale))
        strided = np.asarray(nyul_transform_fast(
            jnp.asarray(img), cl, lm, scale, percentile_stride=4))
        assert np.abs(exact - strided).max() < 0.02

    def test_stride_env_default(self, rng, monkeypatch):
        imgs = rng.rand(4, 16, 16, 2).astype(np.float32)
        ny = NyulStandardizer()
        ny.fit(imgs)
        a = np.asarray(ny.transform(jnp.asarray(imgs[0]), fast=True))
        monkeypatch.setenv("DMF_NYUL_STRIDE", "2")
        b = np.asarray(ny.transform(jnp.asarray(imgs[0]), fast=True))
        c = np.asarray(ny.transform(jnp.asarray(imgs[0]), fast=True,
                                    percentile_stride=2))
        assert np.allclose(b, c)  # env default == explicit stride
        assert np.abs(a - b).max() < 0.2  # subsampled stats stay sane


class TestResize:
    def test_nearest_matches_torch(self, rng):
        img = rng.rand(1, 64, 64, 1).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(img), (32, 32)))
        ref = (
            torch.nn.functional.interpolate(
                torch.tensor(img).permute(0, 3, 1, 2), size=(32, 32), mode="nearest"
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        assert np.array_equal(ours, ref)

    def test_bilinear_close_to_torch(self, rng):
        img = rng.rand(1, 32, 32, 2).astype(np.float32)
        from dmf_tpu.ops import resize_bilinear

        ours = np.asarray(resize_bilinear(jnp.asarray(img), (16, 16)))
        ref = (
            torch.nn.functional.interpolate(
                torch.tensor(img).permute(0, 3, 1, 2),
                size=(16, 16),
                mode="bilinear",
                align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        assert np.allclose(ours, ref, atol=1e-5)


class TestAdaptivePool:
    def test_matches_torch_downsample(self, rng):
        from dmf_tpu.ops import adaptive_avg_pool

        x = rng.rand(2, 48, 48, 3).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), (13, 13)))
        ref = (
            torch.nn.functional.adaptive_avg_pool2d(
                torch.tensor(x).permute(0, 3, 1, 2), (13, 13)
            ).permute(0, 2, 3, 1).numpy()
        )
        assert np.allclose(ours, ref, atol=1e-5)

    def test_matches_torch_upsample(self, rng):
        # the encoder's proj_pool upsamples 32^2 features to (proj_dim=64)^2
        from dmf_tpu.ops import adaptive_avg_pool

        x = rng.rand(1, 32, 32, 2).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), (64, 64)))
        ref = (
            torch.nn.functional.adaptive_avg_pool2d(
                torch.tensor(x).permute(0, 3, 1, 2), (64, 64)
            ).permute(0, 2, 3, 1).numpy()
        )
        assert np.allclose(ours, ref, atol=1e-5)

    def test_divisible_fast_path(self, rng):
        from dmf_tpu.ops import adaptive_avg_pool

        x = rng.rand(1, 16, 16, 2).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), (4, 4)))
        ref = (
            torch.nn.functional.adaptive_avg_pool2d(
                torch.tensor(x).permute(0, 3, 1, 2), (4, 4)
            ).permute(0, 2, 3, 1).numpy()
        )
        assert np.allclose(ours, ref, atol=1e-5)

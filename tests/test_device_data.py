"""HBM-resident dataset path (data/pipeline.py::stage_dataset_to_device).

Measured on the tunneled v5e (r5): the fit loop's per-step 168 MB
host->device batch transfer capped the product fusion loop at 0.2 steps/s
vs the 6.2 bare step; ``device=True`` batches become on-device gathers.
These tests pin (1) batch-for-batch equality with the host path under the
same shuffle rng, (2) the host-readable ``valid`` mask contract, and
(3) end-to-end fit_single equivalence with ``Config.device_data`` on/off.
"""

import dataclasses

import jax
import numpy as np

from dmf_tpu.data.pipeline import (
    ArrayDataset,
    device_data_auto,
    iterate_batches,
    stage_dataset_to_device,
)

from tests.test_multifold_loop import (  # noqa: E402
    B,
    S,
    StubProcessor,
    make_fold_data,
    tiny_cfg,
)


def _dataset(n=10, seed=0):
    rng = np.random.RandomState(seed)
    return ArrayDataset(
        imgs=rng.rand(n, 8, 8, 3).astype(np.float32),
        labels=(np.arange(n) % 4).astype(np.int64),
    )


class TestDeviceIterate:
    def test_matches_host_path_batch_for_batch(self):
        ds = _dataset()
        host = list(iterate_batches(ds, 4, shuffle=True,
                                    rng=np.random.RandomState(3),
                                    pad_to_batch=False))
        dev = list(iterate_batches(ds, 4, shuffle=True,
                                   rng=np.random.RandomState(3),
                                   pad_to_batch=False, device=True))
        assert len(host) == len(dev)
        for hb, db in zip(host, dev):
            assert set(hb) == set(db)
            for k in hb:
                np.testing.assert_array_equal(np.asarray(hb[k]),
                                              np.asarray(db[k]))

    def test_valid_mask_is_host_array(self):
        """The device path's contract: ``valid`` stays numpy so callers
        read it without a device sync."""
        ds = _dataset(n=7)
        batches = list(iterate_batches(ds, 4, pad_to_batch=True,
                                       device=True))
        for b in batches:
            assert isinstance(b["valid"], np.ndarray)
            assert not isinstance(b["imgs"], np.ndarray)  # on device
        # padded tail rows marked invalid exactly like the host path
        np.testing.assert_array_equal(batches[-1]["valid"],
                                      [1.0, 1.0, 1.0, 0.0])

    def test_staging_cached_on_dataset(self):
        ds = _dataset()
        a = stage_dataset_to_device(ds)
        b = stage_dataset_to_device(ds)
        assert a is b

    def test_auto_resolution(self):
        ds = _dataset()
        # explicit override always wins
        assert device_data_auto(ds, True) is True
        assert device_data_auto(ds, False) is False
        # CPU backend: host memory IS device memory — auto stays off
        assert jax.default_backend() == "cpu"
        assert device_data_auto(ds, None) is False


class TestFitLoopEquivalence:
    def test_fit_single_device_data_matches_host(self, tmp_path):
        """Same seed, Config.device_data True vs False: identical epoch
        losses and final params — device residency is a pure transport
        change."""
        from dmf_tpu.models import Encoder
        from dmf_tpu.train import (
            SingleModelOptController,
            TrainState,
            fit_single,
        )

        cfg = tiny_cfg().replace(num_epochs=2)
        train_data, val_data = make_fold_data(cfg, n_train=10, n_val=6,
                                              seed=5)
        model = Encoder(method="dwi", config=cfg.dwi_model,
                        channel_num=cfg.dwi_channel_num,
                        num_classes=cfg.class_num)
        k = {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}
        import jax.numpy as jnp

        variables = model.init(
            k, jnp.zeros((2, S, S, cfg.dwi_channel_num)), train=False)

        results = []
        for device_data in (False, True):
            c = cfg.replace(device_data=device_data)
            res = fit_single(
                c, "dwi", model, TrainState.create(
                    jax.tree.map(lambda x: jnp.array(x, copy=True),
                                 variables)),
                train_data={k2: v.copy() for k2, v in train_data.items()},
                val_data={k2: v.copy() for k2, v in val_data.items()},
                processor=StubProcessor(),
                controller=SingleModelOptController(c, "dwi"),
                workdir=str(tmp_path / f"dd_{device_data}"),
                seed=11, viz_every=0, num_epochs=2, min_epochs=2,
            )
            results.append(res)
        h0, h1 = results[0].history, results[1].history
        assert len(h0) == len(h1)
        for e0, e1 in zip(h0, h1):
            np.testing.assert_allclose(e1["train_loss"], e0["train_loss"],
                                       rtol=1e-6)
            np.testing.assert_allclose(e1["val_loss"], e0["val_loss"],
                                       rtol=1e-6)
        p0 = jax.device_get(results[0].state.params)
        p1 = jax.device_get(results[1].state.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
            p0, p1)

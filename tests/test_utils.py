"""Observability utilities (SURVEY.md §5): metric logging, metrics.json,
mask visualization, profiling hooks."""

import json
import os

import numpy as np
import pytest


class TestMetricLogger:
    def test_jsonl_history(self, tmp_path):
        from dmf_tpu.utils.logging import MetricLogger

        lg = MetricLogger(str(tmp_path), name="m", use_tensorboard=False)
        lg.log_epoch(0, {"loss": 1.5, "acc": 0.25})
        lg.log_epoch(1, {"loss": 1.1, "acc": 0.5})
        lg.close()
        lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert [l["epoch"] for l in lines] == [0, 1]
        assert lines[1]["acc"] == 0.5
        assert len(lg.history) == 2

    def test_tensorboard_events_when_available(self, tmp_path):
        from dmf_tpu.utils.logging import MetricLogger

        pytest.importorskip("torch.utils.tensorboard")
        lg = MetricLogger(str(tmp_path), use_tensorboard=True)
        lg.log_epoch(0, {"loss": 1.0})
        lg.close()
        assert any(f.startswith("events") for f in os.listdir(tmp_path))


class TestSaveMetricsJson:
    def test_roundtrip_with_arrays(self, tmp_path):
        from dmf_tpu.utils.logging import save_metrics_json

        p = str(tmp_path / "metrics.json")
        save_metrics_json(
            p,
            {"acc": 0.5, "confmat": np.eye(2)},
            {"auc": np.float32(0.9)},
            parameters={"batch": 32, "channels": (1, 2)},
        )
        data = json.load(open(p))
        assert data["train_metrics"]["confmat"] == [[1.0, 0.0], [0.0, 1.0]]
        assert abs(data["test_metrics"]["auc"] - 0.9) < 1e-6
        assert data["parameters"]["channels"] == [1, 2]


class TestVisualizeMask:
    def test_writes_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from dmf_tpu.utils.visualize import visualize_mask_triplet

        rng = np.random.RandomState(0)
        out = visualize_mask_triplet(
            rng.rand(32, 32, 3),
            (rng.rand(32, 32) > 0.5).astype(np.float32),
            rng.randn(32, 32, 1),
            str(tmp_path / "viz" / "mask.png"),
        )
        assert os.path.exists(out) and os.path.getsize(out) > 1000

    def test_no_gt_panel(self, tmp_path):
        pytest.importorskip("matplotlib")
        from dmf_tpu.utils.visualize import visualize_mask_triplet

        out = visualize_mask_triplet(
            np.zeros((16, 16)), None, np.zeros((16, 16)),
            str(tmp_path / "m.png"),
        )
        assert os.path.exists(out)


class TestProfiling:
    def test_step_timer(self):
        from dmf_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        assert t.count == 3
        assert t.mean_step_time >= 0.0
        assert set(t.summary()) == {"mean_step_time_s", "steps_per_sec"}


def test_input_stats_debug_line():
    """train.py:1074-1079 parity: input/mask normalization debug line."""
    import numpy as np

    from dmf_tpu.utils.logging import input_stats

    x = np.linspace(0.0, 1.0, 16).reshape(2, 2, 2, 2)
    s = input_stats(x, masks=np.ones((2, 2, 2, 1)))
    assert "Min=0.0000" in s and "Max=1.0000" in s
    assert "Mask Stats" in s and "Mean=1.0000" in s
    assert "Mask" not in input_stats(x)

"""Observability: metric history, JSONL logs, optional TensorBoard.

Replaces TensorBoardLogger + HistoryCallback + metrics.json
(run_training.py:39-43, 338-349, 392-407).  TensorBoard event files are
written via torch.utils.tensorboard when available (torch-cpu ships in the
image); the JSONL history is always written and is the source of truth.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


class MetricLogger:
    def __init__(self, log_dir: str, name: str = "metrics", use_tensorboard: bool = True):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(self.log_dir, f"{name}.jsonl")
        self.history: List[Dict[str, Any]] = []
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=self.log_dir)
            except Exception:
                self._tb = None

    def log_epoch(self, epoch: int, metrics: Dict[str, float]) -> None:
        record = {"epoch": epoch, "time": time.time()}
        # vector metrics (e.g. per-group lrs — the reference's
        # LearningRateMonitor pg{i} scalars) expand to indexed keys
        flat = {}
        for k, v in metrics.items():
            if isinstance(v, (list, tuple)):
                flat.update({f"{k}_{i}": float(x) for i, x in enumerate(v)})
            else:
                flat[k] = float(v)
        record.update(flat)
        self.history.append(record)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in flat.items():
                try:
                    self._tb.add_scalar(k, float(v), epoch)
                except Exception:
                    pass

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


def save_metrics_json(
    path: str,
    train_metrics: Dict[str, Any],
    test_metrics: Dict[str, Any],
    parameters: Optional[Dict[str, Any]] = None,
) -> None:
    """Final per-run metrics file (run_training.py:392-407 equivalent)."""

    def clean(obj):
        if isinstance(obj, dict):
            return {k: clean(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [clean(v) for v in obj]
        if hasattr(obj, "tolist"):
            return obj.tolist()
        return obj

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "train_metrics": clean(train_metrics),
                "test_metrics": clean(test_metrics),
                "parameters": clean(parameters) if parameters else None,
            },
            f,
            indent=2,
        )


def input_stats(inputs, masks=None) -> str:
    """Input-normalization debug line (train.py:1074-1079 parity).

    Host-side; call on a first batch under ``debug_training`` to confirm
    preprocessing produced the expected ranges.
    """
    import numpy as np

    x = np.asarray(inputs)
    s = (f"[DEBUG] Input Stats: Min={x.min():.4f}, Max={x.max():.4f}, "
         f"Mean={x.mean():.4f}, Std={x.std():.4f}")
    if masks is not None:
        m = np.asarray(masks)
        s += (f"\n[DEBUG] Mask Stats: Min={m.min():.4f}, Max={m.max():.4f}, "
              f"Mean={m.mean():.4f}")
    return s

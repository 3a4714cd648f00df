"""Checkpointing via Orbax, keyed on a monitored metric.

Replaces Lightning ``ModelCheckpoint(monitor='val_acc', mode='max', top-1,
filename='best')`` (run_training.py:93-99) and the best-reload after fit
(run_training.py:123-131).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax


class BestCheckpointer:
    """Keep the single best checkpoint by a monitored metric."""

    def __init__(self, directory: str, monitor: str = "val_acc", mode: str = "max"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best: Optional[float] = None
        self.best_path: Optional[str] = None

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        return value > self.best if self.mode == "max" else value < self.best

    def maybe_save(self, state: Any, metrics: dict, epoch: int) -> bool:
        value = metrics.get(self.monitor)
        if value is None or not self._improved(float(value)):
            return False
        self.best = float(value)
        self.best_path = os.path.join(self.directory, "best")
        save_pytree(self.best_path, state)
        with open(os.path.join(self.directory, "best.json"), "w") as f:
            json.dump({"epoch": epoch, self.monitor: self.best}, f)
        return True

    def restore_best(self, target: Any) -> Any:
        if self.best_path is None:
            best = os.path.join(self.directory, "best")
            if not os.path.exists(best + ".msgpack"):
                raise FileNotFoundError(f"no best checkpoint in {self.directory}")
            self.best_path = best
        return restore_pytree(self.best_path, target)


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a pytree (flax msgpack — fast, single file, portable)."""
    from flax import serialization

    data = serialization.to_bytes(tree)
    with open(path + ".msgpack", "wb") as f:
        f.write(data)


def restore_pytree(path: str, target: Any) -> Any:
    """Accepts either the save_pytree stem ('.../best') or the actual
    on-disk filename ('.../best.msgpack') — users naturally pass the file
    they can see."""
    from flax import serialization

    file = path if path.endswith(".msgpack") else path + ".msgpack"
    with open(file, "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(target, data)
    return restored


class OrbaxCheckpointer:
    """Async Orbax checkpointing for large states (multi-host safe).

    Used for periodic resume checkpoints; ``BestCheckpointer`` covers the
    best-metric snapshot.  Gated so environments without orbax still work.
    """

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any) -> None:
        path = os.path.join(self.directory, f"step_{step}")
        self._ckptr.save(path, state, force=True)

    def save_named(self, name: str, state: Any) -> None:
        """Overwrite a fixed-name checkpoint (rolling 'last')."""
        self.wait()  # one async save in flight at a time
        self._ckptr.save(os.path.join(self.directory, name), state, force=True)

    def restore(self, step: int, target: Any) -> Any:
        path = os.path.join(self.directory, f"step_{step}")
        return self._ckptr.restore(path, target)

    def restore_named(self, name: str, target: Any) -> Any:
        return self._ckptr.restore(os.path.join(self.directory, name), target)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()


class RollingSaver:
    """Rolling 'last' resume checkpoint for the fit loops.

    Async Orbax when available — the serialization overlaps the next epoch's
    device compute instead of stalling the host loop (the Lightning reference
    blocks on torch.save) — with a synchronous msgpack fallback so
    orbax-less environments still get resume.
    """

    def __init__(self, directory: str, name: str = "last"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.name = name
        try:
            self._orbax: Optional[OrbaxCheckpointer] = OrbaxCheckpointer(
                self.directory
            )
        except Exception:
            self._orbax = None

    def save(self, state: Any) -> None:
        if self._orbax is not None:
            self._orbax.save_named(self.name, state)
        else:
            save_pytree(os.path.join(self.directory, self.name), state)

    def wait(self) -> None:
        if self._orbax is not None:
            self._orbax.wait()


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore from any supported format: an Orbax directory (RollingSaver),
    a flax msgpack file (BestCheckpointer / save_pytree), or a reference
    PyTorch/Lightning ``.ckpt``/``.pth`` (migration path — weights only,
    optimizer state stays fresh; prepare_single_model.py:208-218's
    load_pretrained equivalent)."""
    if path.endswith((".ckpt", ".pth")):
        from ..models.ref_ckpt import (
            import_reference_encoder,
            import_reference_fusion,
            load_lightning_ckpt,
        )

        sd = load_lightning_ckpt(path)
        tpl = {"params": target.params, "batch_stats": target.batch_stats}
        if "classification_head" in target.params:
            v = import_reference_encoder(sd, tpl)
        elif "classifier" in target.params:
            v = import_reference_fusion(sd, tpl)
        else:
            raise ValueError(
                "torch-checkpoint resume supports single encoder / fusion "
                "model states; combined fusion TrainStates need per-model "
                "import via dmf_tpu.models.ref_ckpt"
            )
        return target.replace(params=v["params"],
                              batch_stats=v["batch_stats"])
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(path, target)
    return restore_pytree(path, target)

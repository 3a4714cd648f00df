"""Device mesh construction — the single source of topology truth.

The reference is single-device (SURVEY.md §2.10: no distributed machinery
anywhere); this layer is the TPU-native scaling design the north star
requires (v5e-8, BASELINE.json): a ('data', 'model') mesh where batch rides
the data axis and wide layers may shard over the model axis.  Collectives
are inserted by XLA GSPMD from sharding annotations and ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def auto_mesh_shape(n_devices: int, prefer_model: int = 1) -> Tuple[int, int]:
    """Pick (n_data, n_model): model axis only if it divides evenly."""
    n_model = prefer_model if n_devices % max(prefer_model, 1) == 0 else 1
    return n_devices // n_model, n_model


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_mesh() -> Mesh:
    """Trivial 1x1 mesh over the first device (single-chip path)."""
    return make_mesh(1, 1, devices=jax.devices()[:1])


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the production mesh from ``Config.parallel.mesh_shape``.

    Returns None (single-device path) when no mesh shape is configured or it
    resolves to a single device; raises if more devices are requested than
    exist.
    """
    shape = cfg.parallel.mesh_shape
    if shape is None:
        return None
    n_data, n_model = shape
    if n_data * n_model <= 1:
        return None
    have = len(jax.devices())
    if n_data * n_model > have:
        raise ValueError(
            f"mesh_shape {shape} needs {n_data * n_model} devices, "
            f"have {have}"
        )
    return make_mesh(n_data, n_model)

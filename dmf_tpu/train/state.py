"""Train state container (flax.struct) shared by single and fusion training."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .optim import AdamWState, adamw_init


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: AdamWState
    step: jnp.ndarray

    @classmethod
    def create(cls, variables) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=adamw_init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

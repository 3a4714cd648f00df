from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    auto_mesh_shape,
    batch_sharding,
    local_mesh,
    make_mesh,
    mesh_from_config,
    replicated,
)
from .sharding import (
    make_spmd_step,
    param_spec,
    shard_state,
    state_shardings,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "auto_mesh_shape",
    "batch_sharding",
    "local_mesh",
    "make_mesh",
    "mesh_from_config",
    "replicated",
    "make_spmd_step",
    "param_spec",
    "shard_state",
    "state_shardings",
]

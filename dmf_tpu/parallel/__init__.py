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
from .multifold import (
    index_fold_state,
    make_multifold_predictor,
    make_multifold_step,
    stack_fold_batches,
    stack_fold_states,
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
    "index_fold_state",
    "make_multifold_predictor",
    "make_multifold_step",
    "stack_fold_batches",
    "stack_fold_states",
    "make_spmd_step",
    "param_spec",
    "shard_state",
    "state_shardings",
]

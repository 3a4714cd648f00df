"""Parameter/state sharding rules and SPMD step wrapping.

Design (scaling-book recipe): annotate shardings at the jit boundary, let
XLA GSPMD insert the collectives.  Data parallelism: batch split over
``data``, params replicated, gradient all-reduce inserted automatically.
Tensor parallelism: wide Dense kernels (transformer qkv/mlp, cross-attn,
large 1x1 convs) sharded over ``model`` — activations stay sharded through
the pair of matmuls, with psum at the second (Megatron pattern, expressed
purely via NamedSharding).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, replicated

# param-path substrings whose Dense kernels participate in tensor parallelism
_TP_COL_PARALLEL = ("attn/qkv", "mlp/Dense_0", "q_proj", "k_proj", "v_proj")
_TP_ROW_PARALLEL = ("attn/proj", "mlp/Dense_1", "out_proj")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_spec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one param leaf."""
    if model_size <= 1:
        return P()
    name = _path_str(path)
    if leaf.ndim == 2:
        out_dim, in_dim = leaf.shape[1], leaf.shape[0]
        if any(s in name for s in _TP_COL_PARALLEL) and out_dim % model_size == 0:
            return P(None, MODEL_AXIS)
        if any(s in name for s in _TP_ROW_PARALLEL) and in_dim % model_size == 0:
            return P(MODEL_AXIS, None)
    if leaf.ndim == 4 and "kernel" in name:
        # conv kernels (kh, kw, cin, cout): shard large output channels
        cout = leaf.shape[-1]
        if cout >= 128 and cout % model_size == 0:
            return P(None, None, None, MODEL_AXIS)
    if leaf.ndim == 1:
        # biases/scales paired with col-parallel kernels
        if any(s in name for s in _TP_COL_PARALLEL) and leaf.shape[0] % model_size == 0:
            return P(MODEL_AXIS)
    return P()


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a TrainState (params + moments sharded alike,
    batch_stats replicated)."""
    model_size = mesh.shape[MODEL_AXIS]

    def spec_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: NamedSharding(mesh, param_spec(p, x, model_size)), tree
        )

    import dataclasses

    from ..train.state import TrainState
    from ..train.optim import AdamWState

    p_sh = spec_tree(state.params)
    return TrainState(
        params=p_sh,
        batch_stats=jax.tree.map(lambda _: replicated(mesh), state.batch_stats),
        opt_state=AdamWState(
            mu=spec_tree(state.opt_state.mu),
            nu=spec_tree(state.opt_state.nu),
            count=replicated(mesh),
        ),
        step=replicated(mesh),
    )


def shard_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh per the sharding rules."""
    sh = state_shardings(state, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, sh,
        is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)),
    )


def make_spmd_step(step_fn: Callable, mesh: Mesh, state_sh, donate: bool = True):
    """Wrap a (state, batch, rng, hp) step with explicit jit shardings.

    Batch leaves ride the data axis; rng/hyperparams are replicated.  XLA
    inserts the gradient all-reduce over ``data`` and the TP collectives
    over ``model``.
    """
    batch_sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def place_batch(batch):
        return {k: jax.device_put(v, batch_sh if np.ndim(v) > 0 else rep)
                for k, v in batch.items()}

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, None, rep, rep),
        out_shardings=(state_sh, None),
        donate_argnums=(0,) if donate else (),
    )
    return jitted, place_batch

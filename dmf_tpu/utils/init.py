"""Fast parameter initialization.

On this TPU stack, compiling a full-model ``init`` program is pathologically
slow (~20 min for a ResNet50 encoder vs ~1 min for the forward pass), while
the same init compiles on CPU in seconds.  Initialize on the CPU backend and
transfer once — numerically identical, host->HBM is a one-time cost.
"""

from __future__ import annotations

from typing import Callable

import jax


def init_on_cpu(init_fn: Callable, *args, to_device=None):
    """Run ``init_fn(*args)`` jitted on CPU, then device_put the result."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return jax.jit(init_fn)(*args)
    with jax.default_device(cpu):
        variables = jax.jit(init_fn)(*args)
        variables = jax.block_until_ready(variables)
    target = to_device or jax.devices()[0]
    if target.platform == "cpu":
        return variables
    return jax.device_put(variables, target)

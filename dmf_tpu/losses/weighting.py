"""Per-sample weighted loss reduction for exact padded-tail semantics.

Under a mesh the last batch of an epoch is padded up to a multiple of the
data axis with duplicated rows (data/pipeline.py ``pad_to_multiple``); every
loss in this codebase reduces as an equal-weight mean over the batch of a
per-sample statistic, so running the SAME loss per-sample (vmap over a
batch-of-1 slice) and taking a validity-weighted mean reproduces the
reference's ``DataLoader(drop_last=False)`` short-batch loss exactly —
duplicated rows get weight 0 and drop out of loss, gradient, and metrics.
Batch-coupled BatchNorm statistics are handled separately
(models/layers.py ``bn_sample_weight``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_weighted_reduce(valid: Optional[jnp.ndarray]) -> Callable:
    """Return ``reduce_(loss_fn, *batched_args) -> scalar``.

    ``valid=None`` (the single-device path, where tails run at their exact
    short size) is the identity: ``loss_fn(*args)`` — bit-identical to the
    unweighted behavior.  With a ``(B,)`` 0/1 mask, each loss is evaluated
    per sample (leading axis vmapped, batch dim of 1 re-inserted so the
    loss's own spatial/class reductions are untouched) and combined as
    ``sum(w * per_sample) / sum(w)``.
    """
    if valid is None:
        return lambda fn, *args: fn(*args)
    v = valid.astype(jnp.float32)
    vsum = jnp.maximum(v.sum(), 1.0)

    def reduce_(fn, *args):
        def one(*sliced):
            return fn(*(jax.tree.map(lambda t: t[None], s) for s in sliced))

        per = jax.vmap(one)(*args)
        return (per.astype(jnp.float32) * v).sum() / vsum

    return reduce_

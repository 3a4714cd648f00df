"""Fold-parallel training: the K-fold CV loop as ONE vmapped program.

The reference trains its 5 stratified folds strictly sequentially — the
outer product loop in run.py:59-76 re-enters ``Trainer.fit`` per fold.  On
TPU the fold axis is embarrassingly parallel: ``jax.vmap`` over a stacked
fold axis turns K optimizer states + K batches into one program.  Semantics
are EXACTLY K independent runs (per-fold dropout rngs, per-fold BN stats,
per-fold Adam moments; pinned by tests/test_multifold.py against
sequential execution).

Where it wins — measured honestly (r4, v5e-1): on a SINGLE chip it does
NOT.  The full-geometry fusion step is conv-roofline-bound already at
batch 8 (24.3 steps/s = 194 samples/s, within 3% of B=32's 199), so there
is no underfed regime for the fold axis to fill; vmapping folds only grows
the live working set (K x optimizer/activation states — K=5 x B=32 wants
139.5 GB vs 15.75 GB HBM) and costs MFU (K=5 x B=8: 149 samples/s = 34.4%
MFU; K=2 x B=32: 160 samples/s = 38.3% MFU; sequential B=32: 199 samples/s
at 44.6% MFU).  The fold axis pays off across DEVICES: with ``mesh=`` the
K folds ride K data-axis device groups via ``shard_map`` with ZERO
collectives (folds never communicate), turning 5-fold CV into one
near-linear SPMD program on a pod slice — validated on the 8-device
virtual mesh (tests/test_multifold.py, sharded ≡ unsharded) and in the
flagship dryrun.  Single-chip runs should keep the sequential loop; the
``--parallel-folds`` product path is for meshes (and for small models /
tiny batches that genuinely underfeed a chip).

Composes with SPMD via ``shard_map`` (pass ``mesh=``): each data-axis
device group trains K/n_data folds locally — folds never communicate, so
the body needs no collectives and the GSPMD partitioner is bypassed
entirely.  (Bypassed deliberately: auto-partitioning the vmapped train
step by input shardings CHECK-crashes XLA:CPU's SPMD partitioner in
jax 0.9 — shard_map is also simply the right tool for an embarrassingly
parallel axis.)

Usage::

    raw = make_single_train_step(cfg, m, model, clf, mask_fn, spec,
                                 jit_compile=False)
    step = make_multifold_step(raw)
    stacked = stack_fold_states([state_f0, state_f1, ...])
    stacked, metrics = step(stacked, stacked_batch, fold_rngs, hp)
    # metrics leaves have a leading (K,) fold axis
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS


def stack_fold_states(states: Sequence):
    """Stack per-fold TrainStates leaf-wise into one (K, ...) state."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *states)


def index_fold_state(stacked, i: int):
    """Extract fold ``i``'s TrainState from a stacked state (for
    checkpointing / per-fold eval)."""
    return jax.tree.map(lambda leaf: leaf[i], stacked)


def stack_fold_batches(batches: Sequence[dict]) -> dict:
    """Stack per-fold batch dicts (same shapes across folds — pad ragged
    fold tails with the existing ``valid``-mask machinery first)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *batches)


def make_multifold_predictor(predictor: Callable) -> Callable:
    """vmap a predictor over the fold axis: every argument fold-stacked.

    Pairs with multifold training for the test phase (the reference
    evaluates per fold sequentially, train.py:736-823): stack each fold's
    ``variables`` (``stack_fold_states``-style tree stack), its test batch,
    and K split rng keys, and the whole K-fold TTA x MC ensemble runs as
    one program.  Works on the jitted output of ``make_single_predictor``
    / ``make_fusion_predictor`` directly (jit-of-vmap-of-jit collapses).
    """
    return jax.jit(jax.vmap(predictor))


def make_multifold_step(raw_step: Callable, donate: bool = True,
                        mesh: Optional[Mesh] = None,
                        per_fold_hp: bool = False,
                        with_active: bool = False) -> Callable:
    """vmap an UNJITTED train step over the leading fold axis.

    ``raw_step``: ``(state, batch, rng, hp) -> (state, metrics)`` from
    ``make_single_train_step(..., jit_compile=False)`` or
    ``make_fusion_train_step(..., jit_compile=False)``.  Hyperparams are
    shared across folds by default (the reference runs the same schedule
    per fold); ``per_fold_hp=True`` maps hp too — stack each
    ``(num_groups,)`` hyperparam vector to ``(K, num_groups)`` — so
    fold-individual plateau/unfreeze schedules (each fold's controller
    reacting to ITS val loss, reference scheduler_selector semantics)
    stay exact under lockstep training.  state/batch/rng always carry the
    (K, ...) fold axis.

    ``with_active=True`` adds a trailing ``(K,)`` 0/1 argument: a fold
    with ``active=0`` gets its ENTIRE pre-step state selected back after
    the step (params, BN stats, Adam moments, step counter — one
    ``jnp.where`` per leaf), making the lockstep program exact for folds
    that differ in per-epoch batch counts (ragged K-fold splits) or have
    already early-stopped: the dead fold computes a discarded step instead
    of forcing a fallback to sequential execution.  Signature becomes
    ``(state, batch, rng, hp, active) -> (state, metrics)``.

    With ``mesh``, the fold axis is split over the mesh's data axis via
    ``shard_map`` (K must be divisible by the data-axis size); each device
    group steps its folds independently — zero collectives.
    """
    hp_ax = 0 if per_fold_hp else None
    if with_active:
        def masked_step(state, batch, rng, hp, active):
            new_state, metrics = raw_step(state, batch, rng, hp)
            keep = jax.tree.map(
                lambda n, o: jnp.where(active, n, o), new_state, state)
            return keep, metrics

        vstep = jax.vmap(masked_step, in_axes=(0, 0, 0, hp_ax, 0))
        if mesh is not None:
            fold, rep = P(DATA_AXIS), P()
            sharded = jax.shard_map(
                vstep, mesh=mesh,
                in_specs=(fold, fold, fold,
                          fold if per_fold_hp else rep, fold),
                out_specs=(fold, fold),
                check_vma=False,
            )
            return jax.jit(sharded, donate_argnums=(0,) if donate else ())
        return jax.jit(vstep, donate_argnums=(0,) if donate else ())
    vstep = jax.vmap(raw_step, in_axes=(0, 0, 0, hp_ax))
    if mesh is not None:
        fold, rep = P(DATA_AXIS), P()
        sharded = jax.shard_map(
            vstep, mesh=mesh,
            # pytree-prefix specs: every state/batch/rng leaf carries the
            # fold axis at dim 0; hyperparams replicate unless per-fold
            in_specs=(fold, fold, fold, fold if per_fold_hp else rep),
            out_specs=(fold, fold),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())
    return jax.jit(vstep, donate_argnums=(0,) if donate else ())

"""Optimizer machinery: grouped AdamW with dynamic per-group hyperparameters.

TPU-native redesign of the reference's optimizer factories
(selector_helpers.py:119-742).  The reference mutates the optimizer by
adding param groups mid-training (unfreeze events); under XLA that would
recompile the train step.  Here the group structure is **static** (a
per-leaf group id computed once from the param tree) and the per-group
learning rate / weight decay / trainable flag are **dynamic scalar inputs**
to the compiled step — unfreezing changes a (num_groups,) vector on the
host, never the compiled program.

Equivalences proven by construction:
* frozen groups get zero gradients, so their Adam moments stay exactly zero
  — identical to the reference's "fresh param group added at unfreeze"
  (selector_helpers.py:207-217, 588-613);
* discriminative LR/WD per depth follow selector_helpers.py:262-271:
  ``lr_i = base_lr / f^(n-1-i)``, ``wd_i = reg_base * g^(n-1-i)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig

# ---------------------------------------------------------------------------
# Param grouping (selector_helpers.py:156-181 / 396-433)
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def classify_param(name: str, use_backbone: bool) -> Optional[int]:
    """Map a param path to its reference group index, or None if excluded.

    Groups (n=3):
      with backbone:    0=backbone(+adapter necks), 1=block1+block2, 2=block3+other
      without backbone: 0=block1, 1=block2, 2=block3+other
    ``classification_head`` is excluded entirely — the reference never adds
    it to any optimizer group (selector_helpers.py:161-162), leaving the
    single-model classifier frozen at init.  This exclusion is applied when
    ``reference_compat`` (see :func:`build_group_spec`).
    """
    if use_backbone and ("backbone" in name or "backbone_neck" in name):
        return 0
    if "block1" in name:
        return 1 if use_backbone else 0
    if "block2" in name:
        return 1
    if "block3" in name:
        return 2
    return 2  # 'other'


class GroupSpec(NamedTuple):
    """Static grouping metadata for one model's param tree."""

    group_ids: Any  # pytree of int32 leaf -> group index (or -1 excluded)
    num_groups: int
    names: Tuple[str, ...]  # debug: representative group names


def build_group_spec(
    params,
    use_backbone: bool,
    reference_compat: bool = True,
    prefix: str = "",
    num_groups: int = 3,
    group_offset: int = 0,
    exclude_classification_head: Optional[bool] = None,
) -> GroupSpec:
    """Compute the per-leaf group-id tree for ``params``."""
    if exclude_classification_head is None:
        exclude_classification_head = reference_compat

    def leaf_gid(path, leaf):
        name = prefix + _path_str(path)
        if exclude_classification_head and "classification_head" in name:
            return -1
        return classify_param(name, use_backbone) + group_offset

    ids = jax.tree_util.tree_map_with_path(leaf_gid, params)
    names = tuple(
        ["backbone", "block1+2", "block3+other"]
        if use_backbone
        else ["block1", "block2", "block3+other"]
    )
    return GroupSpec(group_ids=ids, num_groups=num_groups, names=names)


def describe_groups(params, spec: GroupSpec, hp=None,
                    max_examples: int = 3) -> str:
    """Human-readable optimizer-group dump (selector_helpers.py:336-353's
    print_grouping_debug + print_param_group_summary equivalent).

    Returns the text instead of printing so callers can route it to logs;
    per group: leaf/param counts, current lr/wd/trainable from ``hp`` when
    given, and a few example parameter paths.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_ids = jax.tree_util.tree_leaves(spec.group_ids)
    by_group: Dict[int, list] = {}
    for (path, leaf), gid in zip(flat, flat_ids):
        by_group.setdefault(int(gid), []).append(
            (_path_str(path), int(np.prod(leaf.shape)) if leaf.shape else 1)
        )
    lines = ["optimizer groups:"]
    for gid in sorted(by_group):
        entries = by_group[gid]
        n_params = sum(n for _, n in entries)
        if gid < 0:
            head = f"  [excluded] {len(entries)} leaves, {n_params:,} params"
        else:
            name = (spec.names[gid - (min(g for g in by_group if g >= 0))]
                    if gid - (min(g for g in by_group if g >= 0))
                    < len(spec.names) else str(gid))
            head = (f"  group {gid} ({name}): {len(entries)} leaves, "
                    f"{n_params:,} params")
            if hp is not None:
                head += (f", lr={float(hp.lr[gid]):.2e}"
                         f" wd={float(hp.wd[gid]):.2e}"
                         f" trainable={float(hp.trainable[gid]):.0f}")
        lines.append(head)
        for path, _ in entries[:max_examples]:
            lines.append(f"      {path}")
    return "\n".join(lines)


def discriminative_hparams(
    opt_cfg, num_groups: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-group (lr, wd) vectors per selector_helpers.py:237-277."""
    n = num_groups
    lrs = np.zeros(n, np.float64)
    wds = np.zeros(n, np.float64)
    for i in range(n):
        if opt_cfg.discriminative_lr:
            lrs[i] = opt_cfg.lr / (opt_cfg.lr_decay_factor ** (n - 1 - i))
        else:
            lrs[i] = opt_cfg.lr
        if opt_cfg.discriminative_reg:
            wds[i] = opt_cfg.reg_base * (opt_cfg.reg_decay_factor ** (n - 1 - i))
        else:
            wds[i] = opt_cfg.weight_decay
    return lrs, wds


# ---------------------------------------------------------------------------
# Grouped AdamW (pure functions; state is a pytree)
# ---------------------------------------------------------------------------


# per-group step-count capacity: groups are identified by small static ids;
# 64 comfortably exceeds any real group structure here (single model: 3,
# fusion: ~7)
MAX_GROUPS = 64


class AdamWState(NamedTuple):
    mu: Any
    nu: Any
    # (MAX_GROUPS,) per-group step counts.  torch's unfreeze flow ADDS a
    # fresh param group whose Adam state starts at step=1; a single global
    # count would bias-correct a just-unfrozen group as if it had been
    # training all along (first update ~1/sqrt(1-b2) ~ 3.2x too large).
    count: jnp.ndarray


class GroupedHyperParams(NamedTuple):
    """Dynamic per-group hyperparameters — plain device arrays, safe to feed
    into a jitted step without retracing."""

    lr: jnp.ndarray  # (num_groups,)
    wd: jnp.ndarray  # (num_groups,)
    trainable: jnp.ndarray  # (num_groups,) in {0., 1.}


def adamw_init(params) -> AdamWState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamWState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                      count=jnp.zeros((MAX_GROUPS,), jnp.int32))


def adamw_update(
    grads,
    state: AdamWState,
    params,
    spec: GroupSpec,
    hp: GroupedHyperParams,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One AdamW step with per-leaf (group-indexed) lr/wd/trainable.

    Matches torch.optim.AdamW semantics: decoupled weight decay
    ``p -= lr * (mhat/(sqrt(vhat)+eps) + wd * p)``, and per-GROUP step
    counts that only advance while the group is trainable — a group
    unfrozen at epoch 40 bias-corrects from step 1 exactly like the
    reference's freshly-added torch param group
    (selector_helpers.py:207-217, 588-613).
    Excluded leaves (gid=-1) and frozen groups receive exactly zero update
    and keep their moments untouched (torch skips no-grad params entirely,
    so a group frozen *after* training resumes with undecayed moments).
    """
    G = hp.trainable.shape[0]
    count = state.count.at[:G].add(hp.trainable.astype(jnp.int32))

    def leaf_update(g, m, v, p, gid):
        if gid < 0:
            return p, m, v
        scale = hp.trainable[gid]
        # guard: frozen groups have count 0 -> bc terms would be 0/0; their
        # update is zeroed by `scale` but NaNs would still propagate
        c = jnp.maximum(count[gid], 1).astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c
        g = g.astype(jnp.float32) * scale
        # frozen (scale==0): keep old moments, not b1*m/b2*v decay — torch
        # never visits no-grad params, so their Adam state is untouched
        m2 = jnp.where(scale > 0, b1 * m + (1 - b1) * g, m)
        v2 = jnp.where(scale > 0, b2 * v + (1 - b2) * g * g, v)
        mhat = m2 / bc1
        vhat = v2 / bc2
        upd = mhat / (jnp.sqrt(vhat) + eps) + hp.wd[gid] * p.astype(jnp.float32)
        p2 = p.astype(jnp.float32) - hp.lr[gid] * scale * upd
        return p2.astype(p.dtype), m2, v2

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_ids = treedef.flatten_up_to(spec.group_ids)

    new_p, new_m, new_v = [], [], []
    for g, m, v, p, gid in zip(flat_g, flat_m, flat_v, flat_p, flat_ids):
        p2, m2, v2 = leaf_update(g, m, v, p, int(gid))
        new_p.append(p2)
        new_m.append(m2)
        new_v.append(v2)

    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        AdamWState(
            mu=jax.tree_util.tree_unflatten(treedef, new_m),
            nu=jax.tree_util.tree_unflatten(treedef, new_v),
            count=count,
        ),
    )


def global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.zeros(())


def group_grad_norms(grads, spec: GroupSpec) -> Dict[str, jnp.ndarray]:
    """Per-group gradient norms keyed by the spec's group names.

    The reference logs a backbone-only grad norm alongside the global one
    (train.py:825-862); group ids are static, so this adds no retracing and
    reuses the squares XLA already computes for the global norm.
    """
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_ids = jax.tree_util.tree_leaves(spec.group_ids)
    sq: Dict[int, jnp.ndarray] = {}
    for g, gid in zip(flat_g, flat_ids):
        gid = int(gid)
        if gid < 0:
            continue
        s = jnp.sum(jnp.square(g.astype(jnp.float32)))
        sq[gid] = sq.get(gid, jnp.zeros(())) + s
    names = spec.names
    return {
        f"grad_norm_{names[gid] if gid < len(names) else gid}": jnp.sqrt(s)
        for gid, s in sorted(sq.items())
    }


def count_nonfinite(tree) -> jnp.ndarray:
    """Total count of non-finite gradient entries (the reference's
    NaN-prone-grad warning path, train.py:229-233)."""
    leaves = [jnp.sum(~jnp.isfinite(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree)]
    return sum(leaves) if leaves else jnp.zeros((), jnp.int32)


def clip_by_global_norm(grads, max_norm: float):
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads), norm


# ---------------------------------------------------------------------------
# Host-side freeze/unfreeze + LR controllers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SingleModelOptController:
    """Freeze-on-start + single-shot backbone unfreeze for one encoder.

    Reference: LightningOptimizerFactory (selector_helpers.py:119-353) +
    the unfreeze hook at train.py:246-250.  At
    ``epoch == foundation_model_unfreeze_timer`` the backbone group becomes
    trainable with lr = ``foundation_model_unfreeze_lr`` and wd = 0
    (selector_helpers.py:207-217 — note the reference reads a misspelled
    ``fondation_model_unfreeze_wd`` key, so wd is always 0).
    """

    cfg: Config
    method: str
    lr_scale: float = 1.0  # global multiplier (cosine/warmup schedulers)

    def __post_init__(self):
        mc = self.cfg.model_config(self.method)
        self.use_backbone = mc.use_backbone
        self.base_lrs, self.base_wds = discriminative_hparams(mc.optimizer, 3)
        self.unfrozen = not (self.cfg.backbone_freeze_on_start and self.use_backbone)
        # torch ReduceLROnPlateau mutates each param group's CURRENT lr in
        # place, so reductions only touch groups present in the optimizer
        # at that moment and a group added later by unfreeze starts at its
        # fresh lr (train.py:246-250 add_param_group after any reductions).
        # Tracked as a per-group multiplier over the raw group lr.
        self.group_scales = np.ones(3)

    def on_epoch_start(self, epoch: int) -> None:
        if (
            not self.unfrozen
            and self.cfg.backbone_freeze_on_start
            and epoch == self.cfg.foundation_model_unfreeze_timer
        ):
            self.unfrozen = True
            self.group_scales[0] = 1.0  # fresh param group (torch semantics)

    def _raw_lrs(self) -> np.ndarray:
        lrs = self.base_lrs.copy()
        if self.use_backbone and self.unfrozen and self.cfg.backbone_freeze_on_start:
            # group added at unfreeze with its own lr (wd handled below)
            lrs[0] = self.cfg.foundation_model_unfreeze_lr
        return lrs

    def _present(self) -> np.ndarray:
        trainable = np.ones(3, np.float32)
        if self.use_backbone and not self.unfrozen:
            trainable[0] = 0.0
        return trainable

    def apply_plateau(self, factor: float, min_lr: float) -> None:
        """One torch ``ReduceLROnPlateau`` reduction event:
        ``lr_g = max(lr_g * factor, min_lr)`` for every group currently in
        the optimizer (torch/optim/lr_scheduler.py _reduce_lr semantics)."""
        raw = self._raw_lrs()
        present = self._present()
        for g in range(len(raw)):
            if present[g] and raw[g] > 0:
                cur = raw[g] * self.group_scales[g]
                self.group_scales[g] = max(cur * factor, min_lr) / raw[g]

    def hyperparams(self) -> GroupedHyperParams:
        lrs = self._raw_lrs() * self.group_scales
        wds = self.base_wds.copy()
        trainable = self._present()
        if self.use_backbone and self.unfrozen and self.cfg.backbone_freeze_on_start:
            wds[0] = 0.0
        return GroupedHyperParams(
            lr=jnp.asarray(lrs * self.lr_scale, jnp.float32),
            wd=jnp.asarray(wds, jnp.float32),
            trainable=jnp.asarray(trainable, jnp.float32),
        )


@dataclasses.dataclass
class FusionOptController:
    """Gradual deep->shallow unfreeze across both encoders.

    Reference: LightningFusionOptimizerFactory (selector_helpers.py:357-742):
    groups 0..2 are the merged (dce+dwi) depth groups, group 3 the fusion
    head (always trainable at base lr).  Every ``unfreeze_timer`` epochs one
    encoder group is unfrozen deep->shallow with
    ``lr = backbone_unfreeze_lr * factor^(k-1)`` and
    ``wd = reg_base * reg_decay^(k-1)`` (selector_helpers.py:541-613).
    """

    cfg: Config
    lr_scale: float = 1.0

    def __post_init__(self):
        opt = self.cfg.fusion_model.optimizer
        n = 4  # 3 encoder depth groups + fusion head
        self.base_lrs = np.zeros(n)
        self.base_wds = np.zeros(n)
        for i in range(n):
            self.base_lrs[i] = (
                opt.lr / (opt.lr_decay_factor ** (n - 1 - i))
                if opt.discriminative_lr
                else opt.lr
            )
            self.base_wds[i] = (
                opt.reg_base * (opt.reg_decay_factor ** (n - 1 - i))
                if opt.discriminative_reg
                else opt.weight_decay
            )
        self.layers_unfrozen = 0
        self.num_backbone_groups = self.cfg.backbone_num_groups
        self.frozen = self.cfg.backbone_freeze_on_start
        # per-group unfreeze lr/wd captured at unfreeze time
        self.unfreeze_lrs = self.base_lrs.copy()
        self.unfreeze_wds = self.base_wds.copy()
        # torch plateau reductions mutate only groups present in the
        # optimizer at the event; unfrozen groups join fresh (see
        # SingleModelOptController.group_scales)
        self.group_scales = np.ones(4)

    def on_epoch_start(self, epoch: int) -> None:
        if not self.frozen:
            return
        t = self.cfg.unfreeze_timer
        if epoch == 0 or t <= 0 or epoch % t != 0:
            return
        if self.layers_unfrozen >= self.num_backbone_groups:
            return
        group_idx = self.num_backbone_groups - 1 - self.layers_unfrozen
        self.layers_unfrozen += 1
        k = self.layers_unfrozen
        opt = self.cfg.dwi_model.optimizer
        self.unfreeze_lrs[group_idx] = self.cfg.backbone_unfreeze_lr * (
            self.cfg.backbone_unfreeze_lr_factor ** (k - 1)
        )
        self.unfreeze_wds[group_idx] = opt.reg_base * (
            opt.reg_decay_factor ** (k - 1)
        )
        self.group_scales[group_idx] = 1.0  # fresh param group

    def _raw_lrs_wds(self):
        n = 4
        trainable = np.ones(n, np.float32)
        lrs = self.base_lrs.copy()
        wds = self.base_wds.copy()
        if self.frozen:
            for g in range(self.num_backbone_groups):
                # deep->shallow: group g is unfrozen once layers_unfrozen
                # has covered index (n_bg - 1 - step) for some step < done
                unfrozen = g >= self.num_backbone_groups - self.layers_unfrozen
                if not unfrozen:
                    trainable[g] = 0.0
                else:
                    lrs[g] = self.unfreeze_lrs[g]
                    wds[g] = self.unfreeze_wds[g]
        return lrs, wds, trainable

    def apply_plateau(self, factor: float, min_lr: float) -> None:
        """One torch plateau reduction on the groups currently in the
        optimizer (see SingleModelOptController.apply_plateau)."""
        raw, _, present = self._raw_lrs_wds()
        for g in range(len(raw)):
            if present[g] and raw[g] > 0:
                cur = raw[g] * self.group_scales[g]
                self.group_scales[g] = max(cur * factor, min_lr) / raw[g]

    def hyperparams(self) -> GroupedHyperParams:
        lrs, wds, trainable = self._raw_lrs_wds()
        return GroupedHyperParams(
            lr=jnp.asarray(lrs * self.group_scales * self.lr_scale,
                           jnp.float32),
            wd=jnp.asarray(wds, jnp.float32),
            trainable=jnp.asarray(trainable, jnp.float32),
        )

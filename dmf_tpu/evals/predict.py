"""Uncertainty-aware inference: TTA / MC-dropout / TTA x MC as ONE compiled
program.

The reference runs 4 transforms x 10 MC passes as a Python double loop of
full forwards per test batch (train.py:569-600) — its single biggest
inference inefficiency (SURVEY.md §3.3).  Here the 4 TTA views are folded
into the batch axis (one 4B-sized forward saturates the MXU) and the MC
passes are a ``vmap`` over dropout rngs, so the whole 40-pass ensemble is
one XLA program with no host round-trips.

Semantics parity:
* TTA views: identity, lr-flip, ud-flip, both (train.py:916-923);
* MC mode: dropout active, BatchNorm frozen on running stats
  (train.py:483-506) — our models thread this as ``train=False, mc=True``;
* mean/std over the stacked pass axis with torch's unbiased std
  (train.py:592-594).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import kernel_gates


def tta_views(x: jnp.ndarray) -> jnp.ndarray:
    """Stack the 4 TTA views into the batch axis: (B,H,W,C) -> (4B,H,W,C).

    Order matches the reference transforms list (train.py:104-108):
    id, flip_lr, flip_ud, flip_lrud.  NHWC: lr = W axis (-2), ud = H (-3).
    """
    return jnp.concatenate(
        [x, x[:, :, ::-1], x[:, ::-1], x[:, ::-1, ::-1]], axis=0
    )


def _std(x, axis):
    # torch Tensor.std default is unbiased (ddof=1)
    return jnp.std(x, axis=axis, ddof=1)


def _dropout_key(r):
    """Optionally re-wrap an MC dropout key onto the ``rbg`` PRNG.

    threefry2x32 mask generation is pure VPU work repeated per dropout site
    per pass; ``rbg`` rides the TPU hardware bit generator instead
    (split/fold_in stay threefry on the key data, so flax's ``make_rng``
    path is unchanged).  Default ON on TPU — measured end-to-end win on
    v5e (bench.py --mode tta_mc B=32: 92.5 -> 96.1 vol/s on top of the
    fused epilogue; rbg is also the GSPMD-safe generator, so it holds
    under a mesh).  ``DMF_MC_RBG=0|1`` overrides.  The MC ensemble stays
    a correct dropout ensemble either way (a PRNG impl is not a
    semantic), and the same key remains fully deterministic.
    """
    f = kernel_gates.flag("DMF_MC_RBG", "mc_rbg")
    use_rbg = f if f is not None else (jax.default_backend() == "tpu")
    if not use_rbg:
        return r
    kd = (jax.random.key_data(r)
          if jnp.issubdtype(r.dtype, jax.dtypes.prng_key)
          else r).astype(jnp.uint32)
    return jax.random.wrap_key_data(
        jnp.concatenate([kd, kd]), impl="rbg")


def _mc_map(lean_pass: Callable, rngs: jnp.ndarray,
            chunk: Optional[int]) -> jnp.ndarray:
    """vmap ``lean_pass`` over the MC rng axis, optionally in chunks.

    The plain ``vmap`` fuses all P passes into one giant batch through the
    suffix — peak activation memory scales with P, which is what OOMs
    tta_mc at B>=64 (README perf table).  ``chunk=k`` runs ceil(P/k)
    sequential steps of k fused passes each (``lax.map`` of an inner
    ``vmap``): identical outputs, ~P/k times less live activation memory.
    ``None``/``>=P`` keeps the single-vmap behavior.
    """
    P = rngs.shape[0]
    if chunk is None or chunk >= P:
        return jax.vmap(lean_pass)(rngs)
    chunk = max(1, chunk)
    n_full = (P // chunk) * chunk
    main = rngs[:n_full].reshape(P // chunk, chunk, *rngs.shape[1:])
    out = jax.lax.map(lambda r: jax.vmap(lean_pass)(r), main)
    out = out.reshape(n_full, *out.shape[2:])
    if n_full < P:
        out = jnp.concatenate([out, jax.vmap(lean_pass)(rngs[n_full:])])
    return out


def _shard_map_predictor(predict: Callable, mesh, n_vars: int, n_imgs: int,
                         n_views: int) -> Callable:
    """Wrap a predictor in ``jax.shard_map`` for data-parallel serving.

    Under GSPMD a Pallas custom call cannot be partitioned, so the sharded
    serving path used to fall back to the pure-XLA route.  Inside a
    ``shard_map`` body every device runs the predictor on its LOCAL batch
    shard — a plain single-device program — so the measured-win serving
    kernels (fused epilogue, rbg dropout keys) dispatch exactly as on one
    chip (ops/epilogue_pallas.py::shard_local_dispatch).  The TTA/MC
    ensemble is embarrassingly data-parallel (no collectives), which makes
    this the idiomatic mesh mapping for serving throughput.

    Layout care: aux leaves carry the folded TTA-view axis view-major
    ((views*B, ...)); a per-shard concat would interleave shards into that
    ordering, so the local body splits such leaves to (views, B_local, ...)
    and shards them ``P(None, 'data')``, and the outer wrapper folds them
    back — callers see exactly the unsharded layout.  The MC rng is
    ``fold_in``-ed with the shard index, so passes draw independent masks
    per shard (each sample's ensemble remains a correct iid MC-dropout
    sample; the realized masks differ from the unsharded run, like any
    batch-shape change).

    Variables ride replicated (DP serving); use the GSPMD path for a
    TP-sharded model (the callers gate on the model-axis size).
    """
    from jax.sharding import PartitionSpec as P

    from ..ops import epilogue_pallas as ep
    from ..parallel.mesh import DATA_AXIS

    def local(*args):
        *head, rng = args
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        with ep.shard_local_dispatch():
            mean, std, aux = predict(*head, rng)
        B_local = mean.shape[0]

        def split_views(a):
            if (n_views > 1 and hasattr(a, "ndim") and a.ndim >= 1
                    and a.shape[0] == n_views * B_local):
                return a.reshape(n_views, B_local, *a.shape[1:])
            return a

        return mean, std, jax.tree.map(split_views, aux)

    def sharded(*args):
        imgs = args[n_vars]
        B = imgs.shape[0]
        out_sh = jax.eval_shape(lambda *a: predict(*a), *args)

        def aux_spec(leaf):
            if n_views > 1 and leaf.ndim >= 1 and leaf.shape[0] == n_views * B:
                return P(None, DATA_AXIS)
            if leaf.ndim >= 1 and leaf.shape[0] == B:
                return P(DATA_AXIS)
            return P()  # shard-invariant (e.g. global scalars)

        aux_specs = jax.tree.map(aux_spec, out_sh[2])
        in_specs = tuple([P()] * n_vars + [P(DATA_AXIS)] * n_imgs + [P()])
        # check_vma=False: a pallas_call provides no varying-mesh-axes
        # metadata, so the default replication checker rejects any body
        # that dispatches the fused kernels
        mean, std, aux = jax.shard_map(
            local, mesh=mesh, in_specs=in_specs,
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), aux_specs),
            check_vma=False,
        )(*args)

        def fold_views(a):
            if (n_views > 1 and hasattr(a, "ndim") and a.ndim >= 2
                    and a.shape[0] == n_views and a.shape[1] == B):
                return a.reshape(n_views * B, *a.shape[2:])
            return a

        return mean, std, jax.tree.map(fold_views, aux)

    return jax.jit(sharded)


def _mesh_views(cfg: Config, mode: Optional[str], mesh):
    """(use shard_map?, n_views) for a predictor build; shard_map only for
    a data-parallel mesh (model axis absent or size 1)."""
    from ..parallel.mesh import MODEL_AXIS

    mode = mode or cfg.test_mode
    n_views = 4 if mode in ("tta", "tta_mc") else 1
    use = mesh is not None and mesh.shape.get(MODEL_AXIS, 1) == 1
    return use, n_views


def make_single_predictor(
    cfg: Config,
    model,
    mode: Optional[str] = None,
    mc_passes: Optional[int] = None,
    mc_chunk: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Build a jitted ``predict(variables, imgs, rng) -> (mean, std, aux)``.

    Dispatch mirrors ``predict_custom`` (train.py:608-631).  ``mc_chunk``
    bounds MC-pass activation memory (see ``_mc_map``); defaults to
    ``cfg.mc_chunk``.  ``mesh``: a data-parallel mesh serves the ensemble
    under ``shard_map`` with the fused serving kernels active per shard
    (``_shard_map_predictor``); a mesh with a >1 model axis keeps the
    GSPMD route (pass sharded inputs/variables instead).
    """
    mode = mode or cfg.test_mode
    passes = mc_passes if mc_passes is not None else cfg.mc_passes
    if mc_chunk is None:
        mc_chunk = getattr(cfg, "mc_chunk", None)

    def fwd(variables, x, train=False, mc=False, rng=None, prefix=None):
        rngs = {"dropout": _dropout_key(rng)} if rng is not None else None
        return model.apply(variables, x, train=train, mc=mc, rngs=rngs,
                           prefix=prefix)

    def predict(variables, imgs, rng):
        B = imgs.shape[0]
        if mode == "normal":
            logits, aux, _ = fwd(variables, imgs)
            probs = jax.nn.softmax(logits, axis=-1)
            return probs, jnp.zeros_like(probs), aux

        if mode == "tta":
            xt = tta_views(imgs)
            logits, aux, _ = fwd(variables, xt)
            probs = jax.nn.softmax(logits, axis=-1).reshape(4, B, -1)
            return probs.mean(0), _std(probs, 0), aux

        if mode in ("mc", "tta_mc"):
            if mode == "tta_mc":
                xt, n_views = tta_views(imgs), 4
            else:
                xt, n_views = imgs, 1
            rngs = jax.random.split(rng, passes)
            # dropout lives only after the backbone adapter: hoist the
            # deterministic prefix (modality SE + backbone) out of the MC
            # vmap — it runs ONCE instead of `passes` times
            pre = model.apply(variables, xt, train=False, prefix_only=True)

            # lean passes: only probabilities leave the vmap, so XLA
            # dead-code-eliminates the recon heads / mimic projectors in
            # passes 0..P-2; the LAST pass runs full and supplies aux
            # (same pass count, identical mean/std, aux = last pass's,
            # exactly as before)
            def lean_pass(r):
                logits, _, _ = fwd(variables, xt, mc=True, rng=r, prefix=pre)
                return jax.nn.softmax(logits, axis=-1)

            probs_head = _mc_map(lean_pass, rngs[:-1], mc_chunk)
            logits_last, aux, _ = fwd(variables, xt, mc=True, rng=rngs[-1],
                                      prefix=pre)
            probs = jnp.concatenate(
                [probs_head, jax.nn.softmax(logits_last, axis=-1)[None]]
            ).reshape(passes * n_views, B, -1)
            return probs.mean(0), _std(probs, 0), aux

        raise ValueError(f"Unknown predict mode: {mode}")

    use_sm, n_views = _mesh_views(cfg, mode, mesh)
    if use_sm:
        return _shard_map_predictor(predict, mesh, n_vars=1, n_imgs=1,
                                    n_views=n_views)
    return jax.jit(predict)


def make_fusion_predictor(
    cfg: Config,
    dwi_model,
    dce_model,
    fusion_model,
    mode: Optional[str] = None,
    mc_passes: Optional[int] = None,
    fwd_override: Optional[Callable] = None,
    mc_chunk: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Fusion inference: both encoders + fusion per pass, fully vectorized.

    Reference: LightningFusionModel predict paths (train_fusion.py:485-701)
    rerun both encoders inside the Python TTA/MC double loop; here the whole
    ensemble is one compiled program.

    ``fwd_override`` swaps the per-pass forward (same signature as the
    internal ``fusion_fwd``) — used by the int8 serving path
    (ops/quant.py::make_quantized_fusion_fwd) to run quantized
    uncertainty inference.  ``mc_chunk`` defaults to ``cfg.mc_chunk``
    (see ``_mc_map``).

    Returns ``predict(dwi_vars, dce_vars, fusion_vars, dwi_imgs, dce_imgs,
    rng) -> (mean_probs, std_probs, aux)``.
    """
    mode = mode or cfg.test_mode
    passes = mc_passes if mc_passes is not None else cfg.mc_passes
    if mc_chunk is None:
        mc_chunk = getattr(cfg, "mc_chunk", None)

    def default_fwd(dwi_vars, dce_vars, fusion_vars, dwi_x, dce_x, mc, rng,
                    prefixes=None):
        rngs = {"dropout": _dropout_key(rng)} if rng is not None else None
        pre_d, pre_c = prefixes if prefixes is not None else (None, None)
        _, dwi_aux, dwi_mask = dwi_model.apply(
            dwi_vars, dwi_x, train=False, mc=mc, rngs=rngs, prefix=pre_d
        )
        _, dce_aux, dce_mask = dce_model.apply(
            dce_vars, dce_x, train=False, mc=mc, rngs=rngs, prefix=pre_c
        )
        logits, fused_mask, aux = fusion_model.apply(
            fusion_vars,
            dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_mask, dce_mask,
            train=False, mc=mc, rngs=rngs,
        )
        return logits, aux

    def default_prefixes(dwi_vars, dce_vars, dwi_x, dce_x):
        return (
            dwi_model.apply(dwi_vars, dwi_x, train=False, prefix_only=True),
            dce_model.apply(dce_vars, dce_x, train=False, prefix_only=True),
        )

    default_fwd.compute_prefixes = default_prefixes
    fusion_fwd = fwd_override or default_fwd
    # contract: a fwd may expose ``compute_prefixes`` to let mc/tta_mc hoist
    # the encoders' deterministic prefix (modality SE + backbone) out of the
    # per-pass vmap; overrides without it keep full per-pass forwards
    compute_prefixes = getattr(fusion_fwd, "compute_prefixes", None)

    def predict(dwi_vars, dce_vars, fusion_vars, dwi_imgs, dce_imgs, rng):
        B = dwi_imgs.shape[0]

        if mode == "normal":
            logits, aux = fusion_fwd(
                dwi_vars, dce_vars, fusion_vars, dwi_imgs, dce_imgs, False, None
            )
            probs = jax.nn.softmax(logits, axis=-1)
            return probs, jnp.zeros_like(probs), aux

        if mode == "tta":
            xt_dwi, xt_dce = tta_views(dwi_imgs), tta_views(dce_imgs)
            logits, aux = fusion_fwd(
                dwi_vars, dce_vars, fusion_vars, xt_dwi, xt_dce, False, None
            )
            probs = jax.nn.softmax(logits, axis=-1).reshape(4, B, -1)
            return probs.mean(0), _std(probs, 0), aux

        if mode in ("mc", "tta_mc"):
            if mode == "tta_mc":
                x_dwi, x_dce = tta_views(dwi_imgs), tta_views(dce_imgs)
                n_views = 4
            else:
                x_dwi, x_dce = dwi_imgs, dce_imgs
                n_views = 1
            rngs = jax.random.split(rng, passes)
            pre = (compute_prefixes(dwi_vars, dce_vars, x_dwi, x_dce)
                   if compute_prefixes is not None else None)

            def full_pass(r):
                if pre is not None:
                    return fusion_fwd(
                        dwi_vars, dce_vars, fusion_vars, x_dwi, x_dce, True,
                        r, prefixes=pre,
                    )
                # override without prefix support: full forward
                return fusion_fwd(
                    dwi_vars, dce_vars, fusion_vars, x_dwi, x_dce, True, r
                )

            # lean passes (probs only — XLA prunes recon/projector work);
            # the last pass runs full and supplies aux, as before
            def lean_pass(r):
                logits, _ = full_pass(r)
                return jax.nn.softmax(logits, axis=-1)

            probs_head = _mc_map(lean_pass, rngs[:-1], mc_chunk)
            logits_last, aux = full_pass(rngs[-1])
            probs = jnp.concatenate(
                [probs_head, jax.nn.softmax(logits_last, axis=-1)[None]]
            ).reshape(passes * n_views, B, -1)
            return probs.mean(0), _std(probs, 0), aux

        raise ValueError(f"Unknown predict mode: {mode}")

    use_sm, n_views = _mesh_views(cfg, mode, mesh)
    if use_sm:
        return _shard_map_predictor(predict, mesh, n_vars=3, n_imgs=2,
                                    n_views=n_views)
    return jax.jit(predict)

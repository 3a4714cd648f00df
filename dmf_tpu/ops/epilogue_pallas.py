"""Fused ResLite-block epilogue Pallas kernel: residual+GELU+dropout+SE.

WHY (measured, scripts/analyze_profile.py on the tta_mc trace): the serving
suffix is 81% memory-bound — 28.8% of device time is the SE pools' reduce
fusions and 52.6% elementwise fusions, vs only 16.6% convolution.  XLA
already co-fuses each SE's global-average pool INTO the preceding
elementwise op (the profiled ``convert_reduce_fusion`` both rewrites the
dropout-applied map and emits the pool), so replacing the SE alone cannot
reduce traffic: XLA's [gelu+residual(+dropout) fusion -> pool co-fusion ->
scale multiply] moves 3 reads + 2 writes of the feature map, and an
SE-only kernel still needs its input materialized (2R+2W — the measured
wash/regression of ops/se_pallas.py in context).  Fusing the WHOLE
epilogue — ``out = SE(dropout(gelu(x + identity)))``, the tail of every
ResLiteBlock (models/layers.py; reference model_module.py:220-316) — reads
``x`` and ``identity`` once and writes the scaled map once: 2R + 1W,
a 40% traffic cut for the segment.

Dropout uses the TPU hardware PRNG (``pltpu.prng_seed`` /
``prng_random_bits``) seeded per grid tile: the same (seed, shape, tiling)
is exactly reproducible, distinct tiles and MC passes draw independent
bits.  The mask distribution matches flax's ``Dropout`` (keep with
probability 1-p, scale kept values by 1/(1-p)); the realized mask pattern
differs from threefry, which changes no ensemble semantics (any iid mask
per pass is a correct MC-dropout sample).  ``drop_rate=0`` (plain serving)
skips mask generation entirely and is bit-comparable to the XLA route.

Forward/serving only — training keeps the differentiable XLA path.  The
MC-pass axis folds into the kernel batch via ``jax.custom_batching``
exactly like ops/se_pallas.py.  Dispatch gate: ``DMF_FUSED_EPILOGUE=1``.

Measured (scripts/bench_se.py, v5e, B=128 32x32 bf16, 2026-08-18): under
the 39-pass MC vmap the kernel wins decisively — C=128: 31.9 -> 12.0 ms
(2.66x), C=256: 58.7 -> 20.6 ms (2.85x) per ensemble; unbatched mc wins
mildly (C=256: 3.23 -> 1.88 ms).  Plain eval (drop=0, unvmapped)
first REGRESSED at C=128 (1.73 -> 17.9 ms) under the serialized
``arbitrary`` grid; with the drop-free grid marked ``parallel`` the
segment wins mildly (C=128 1.22x, 256/512 ~wash) but e2e fp serving
still measured 741 vs 766-771 vol/s (see :func:`enabled_eval`).
models/layers.py therefore dispatches the kernel on MC passes by
default; the eval dispatch is opt-in ``DMF_FUSED_EPILOGUE_EVAL=1``.  (The
C=512 vmap39 XLA *baseline* could not be timed — the axon tunnel rejects
its compile payload with HTTP 413; the fused kernel compiles fine.)

Under GSPMD a Pallas custom call does not auto-partition, so a sharded
predictor built on sharding propagation keeps the XLA route.  Data-parallel
mesh serving instead runs the predictor inside ``shard_map``
(evals/predict.py::_shard_map_predictor): each shard is a single-device
program where this kernel dispatches normally — :func:`shard_local_dispatch`
tells :func:`enabled` the trace is per-shard.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_gates
from .se_pallas import _batch_tile, _erf, _VMEM_KERNEL_LIMIT

# x + identity both resident per tile (plus out): tighter budget than the
# single-input SE kernel
_VMEM_BLOCK_LIMIT = 2 * 1024 * 1024
# the transposed variant needs bt >= 8 (minor dims are (bt, C)); allow
# bigger blocks so bt=8 fits even at the 64^2 x 128 site (8 MB blocks,
# 3 arrays double-buffered = 48 MB, under the 64 MB kernel limit)
_VMEM_BLOCK_LIMIT_T = 8 * 1024 * 1024


# Set (via shard_local_dispatch) while tracing a shard_map body: inside
# manual sharding every device runs the kernel on its LOCAL batch shard, so
# the GSPMD can't-partition-a-custom-call restriction doesn't apply and the
# single-device gate below must not veto the dispatch.
_SHARD_LOCAL = contextvars.ContextVar("dmf_epilogue_shard_local",
                                      default=False)


@contextlib.contextmanager
def shard_local_dispatch():
    """Mark the enclosed trace as per-shard-local (inside ``shard_map``).

    Used by the DP shard_map serving predictor (evals/predict.py): its body
    runs per shard, where a Pallas call is just a single-device program —
    the fused serving kernels dispatch exactly as on one chip.
    """
    tok = _SHARD_LOCAL.set(True)
    try:
        yield
    finally:
        _SHARD_LOCAL.reset(tok)


def shard_local_active() -> bool:
    """True while tracing a ``shard_local_dispatch`` body — shared by every
    serving-kernel gate that must not veto dispatch inside ``shard_map``
    (this module's :func:`enabled` and conv3x3_pallas's ``neck_enabled``)."""
    return _SHARD_LOCAL.get()


def enabled() -> bool:
    """Measured-win gate (policy: see ops/se_pallas.py::enabled).

    Default ON for single-device TPU serving — measured end-to-end win
    (bench.py --mode tta_mc B=32: 87.4 -> 92.5 vol/s, and the 2.7-2.9x
    MC-vmap segment wins above).  Multi-device defaults OFF — a Pallas
    custom call does not auto-partition under GSPMD — EXCEPT inside a
    ``shard_map`` body (see :func:`shard_local_dispatch`), where the
    kernel runs on the local shard like on one chip; the DP serving
    predictor uses that path.  ``DMF_FUSED_EPILOGUE=0|1`` overrides
    either way.
    """
    f = kernel_gates.flag("DMF_FUSED_EPILOGUE", "fused_epilogue")
    if f is not None:
        return f
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or _SHARD_LOCAL.get()


def enabled_eval() -> bool:
    """Dispatch gate for the DROP-FREE epilogue on plain-eval forwards.

    Separate from :func:`enabled` because the two cases measured
    differently.  The first cut regressed plain eval 10x with the grid
    marked ``arbitrary`` (serialized); marking the drop-free grid
    ``parallel`` fixed the pathology (scripts/bench_se.py, v5e,
    2026-08-18: segment C=128 1883->1541 us = 1.22x, C=256/512 ~wash)
    but the win does NOT survive in context — e2e fp serving
    (bench.py --batch 128) measured 741 vol/s with the gate on vs
    766-771 on the XLA route: XLA co-fuses the eval epilogue chain with
    the preceding conv's output, so the isolated kernel only adds
    dispatch overhead.  Re-measured with the layout-matched variant
    mix (2026-08-18): 828.6 vs 857.8 on the XLA route — the conv
    co-fusion advantage stands independent of the relayout tax.
    Default OFF on measurement; ``DMF_FUSED_EPILOGUE_EVAL=0|1``
    overrides.
    """
    f = kernel_gates.flag("DMF_FUSED_EPILOGUE_EVAL", "fused_epilogue_eval")
    return False if f is None else f


# Measured winner of the per-site sweep below; "all"/comma-list override.
_DEFAULT_CH = frozenset({512})


def channel_allowed(c: int) -> bool:
    """Site-selective dispatch: ``DMF_FUSED_EPILOGUE_CH='512'`` (or a
    comma list; ``all`` = every eligible site) restricts the kernel to
    the listed channel widths.

    Why: a Mosaic custom call fixes its operands/results to the default
    descending layout, while XLA lays activations out ``{3,0,2,1}``
    (channels minor, then batch) — the profile shows explicit relayout
    fusions at kernel boundaries (tta_mc trace: 2x 7.2 ms on the
    [1152,32,32,256] maps).  Per-segment the kernel wins 2.7-2.9x at
    every site (module docstring), but e2e the relayout tax flips the
    shallow sites: tta_mc B=32 sweep (bench.py, v5e, 2026-08-18) —
    all sites 96.5 vol/s, {128,512} 100.9, {256,512} 99.0, {512} 103.5.
    That tax only applies to the (B,H,W,C) kernel: the layout-matched
    variant (:func:`transposed`, the default) measured best at ALL sites
    (109.3), so unset resolves to every eligible site when transposed,
    else the measured untransposed winner ``{512}`` (the 16x16 site,
    where the boundary maps are small).
    """
    v = kernel_gates.text("DMF_FUSED_EPILOGUE_CH", "fused_epilogue_channels")
    if v is None:
        # transposed kernel: no boundary tax, every site wins (109.3);
        # (B,H,W,C) kernel: only the 16x16x512 site survives the tax
        return True if transposed() else c in _DEFAULT_CH
    v = v.strip()
    if not v or v.lower() == "all":
        return True
    try:
        return c in {int(t) for t in v.split(",") if t.strip()}
    except ValueError:
        return True


def transposed() -> bool:
    """Layout-matched kernel variant gate (``DMF_FUSED_EPILOGUE_T``,
    default ON — measured winner).

    The relayout tax that first forced a {512}-only site default
    (:func:`channel_allowed`) exists because the custom call demands the
    default ``{3,2,1,0}`` layout of ``(B,H,W,C)`` while XLA prefers
    ``{3,0,2,1}`` (physical H,W,B,C).  The transposed variant feeds the
    kernel a logically ``(H,W,B,C)`` array, whose *default* layout IS
    that physical order — the boundary ``transpose`` ops elide to
    layout-only bitcasts and the shallow sites get their 2.7-2.9x segment
    wins without the boundary copies.  Measured e2e (bench.py --mode
    tta_mc B=32, v5e, 2026-08-18): transposed at ALL sites 109.3 vol/s vs
    103.5 untransposed-{512} vs 96.5 untransposed-all vs 87.4 pure XLA.
    ``DMF_FUSED_EPILOGUE_T=0`` reverts to the (B,H,W,C) kernel.
    """
    f = kernel_gates.flag("DMF_FUSED_EPILOGUE_T", "fused_epilogue_transposed")
    return True if f is None else f


def fits_vmem(shape: Tuple[int, ...], dtype) -> bool:
    """Site eligibility for ANY kernel variant (dispatch gate in
    models/layers.py).  Mirrors :func:`se_epilogue`'s per-call variant
    choice: the layout-matched kernel needs a batch divisible by 8 and an
    8-sample block within its budget; everything else (odd tail batches,
    bigger maps) is eligible iff the (B,H,W,C) kernel's one-sample block
    fits its budget."""
    b, h, w, c = shape
    if c % 128:
        return False
    per_sample = h * w * c * jnp.dtype(dtype).itemsize
    if transposed() and b % 8 == 0 and 8 * per_sample <= _VMEM_BLOCK_LIMIT_T:
        return True
    return per_sample <= _VMEM_BLOCK_LIMIT


def _epilogue_kernel(seed_ref, x_ref, id_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     out_ref, *, n_pix: int, drop_rate: float):
    x = x_ref[...]  # (bt, H, W, C)
    bt, H, W, C = x.shape
    y32 = x.astype(jnp.float32) + id_ref[...].astype(jnp.float32)
    y32 = 0.5 * y32 * (1.0 + _erf(y32 * 0.7071067811865476))  # exact GELU
    y = y32.astype(x.dtype)
    if drop_rate > 0.0:
        # per-tile stream: same (seed, grid) is reproducible, tiles and
        # folded MC passes draw independent bits
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits((bt, H, W, C))  # int32
        # keep with prob 1-p: u < (1-p) * 2^32 over the uint32 stream
        # (bitcast — prng_random_bits returns signed int32).  Oriented so
        # the interpreter's zero-stubbed bits (tests) mean keep-everything,
        # i.e. interpret-mode output == undropped/(1-p) exactly.
        ubits = pltpu.bitcast(bits, jnp.uint32)
        keep_thresh = jnp.uint32(
            min(int((1.0 - drop_rate) * (1 << 32)), (1 << 32) - 1))
        keep = (ubits < keep_thresh).astype(x.dtype)
        y = y * keep * jnp.asarray(1.0 / (1.0 - drop_rate), x.dtype)
    flat = y.reshape(bt, n_pix, C)
    pool = (flat.astype(jnp.float32).sum(axis=1)
            / float(n_pix)).astype(x.dtype)  # (bt, C)
    h = jnp.dot(pool, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    s = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    s = jax.nn.sigmoid(s + b2_ref[...].astype(jnp.float32))  # (bt, C) fp32
    out_ref[...] = (flat.astype(jnp.float32) * s[:, None, :]
                    ).reshape(bt, H, W, C).astype(x.dtype)


def _epilogue_kernel_t(seed_ref, x_ref, id_ref, w1_ref, b1_ref, w2_ref,
                       b2_ref, out_ref, *, n_pix: int, drop_rate: float):
    """Layout-matched variant: blocks are (H, W, bt, C) — the default
    layout of this logical shape equals XLA's preferred physical
    activation layout (channels minor, then batch), see :func:`transposed`.
    """
    x = x_ref[...]  # (H, W, bt, C)
    H, W, bt, C = x.shape
    y32 = x.astype(jnp.float32) + id_ref[...].astype(jnp.float32)
    y32 = 0.5 * y32 * (1.0 + _erf(y32 * 0.7071067811865476))  # exact GELU
    y = y32.astype(x.dtype)
    if drop_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits((H, W, bt, C))
        ubits = pltpu.bitcast(bits, jnp.uint32)
        keep_thresh = jnp.uint32(
            min(int((1.0 - drop_rate) * (1 << 32)), (1 << 32) - 1))
        keep = (ubits < keep_thresh).astype(x.dtype)
        y = y * keep * jnp.asarray(1.0 / (1.0 - drop_rate), x.dtype)
    flat = y.reshape(n_pix, bt, C)  # leading-dim collapse only
    pool = (flat.astype(jnp.float32).sum(axis=0)
            / float(n_pix)).astype(x.dtype)  # (bt, C)
    h = jnp.dot(pool, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = (0.5 * h * (1.0 + _erf(h * 0.7071067811865476))).astype(x.dtype)
    s = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    s = jax.nn.sigmoid(s + b2_ref[...].astype(jnp.float32))  # (bt, C) fp32
    out_ref[...] = (flat.astype(jnp.float32) * s[None, :, :]
                    ).reshape(H, W, bt, C).astype(x.dtype)


def _batch_tile_t(b: int, per_sample_bytes: int,
                  budget: int = _VMEM_BLOCK_LIMIT_T) -> int:
    """Largest multiple-of-8 divisor of ``b`` fitting the block budget.

    The Mosaic lowering requires the second-minor block dim — ``bt``
    here — to be a multiple of 8 OR equal to the full array dim, so
    sublane-partial tiles are not an option: batches not divisible by 8
    (direct/interpret test calls) go whole-batch in one block, and
    :func:`se_epilogue` only dispatches this variant on TPU when an
    8-sample block fits the budget (falling back to the (B,H,W,C)
    kernel otherwise)."""
    if b % 8:
        return b
    bt = max(8, min(b, budget // max(per_sample_bytes, 1)) // 8 * 8)
    while b % bt:
        bt -= 8
    return bt


@functools.partial(jax.jit,
                   static_argnames=("drop_rate", "interpret"))
def _epilogue_pallas_t(seed, x, identity, w1, b1, w2, b2,
                       drop_rate: float = 0.0, interpret: bool = False):
    B, H, W, C = x.shape
    mid = w1.shape[1]
    per_sample = H * W * C * jnp.dtype(x.dtype).itemsize
    # drop-free (parallel grid): window pipelining at 2 buffering levels
    # plus ~10x-block-size register-allocator spill slots blew the 128 MB
    # VMEM on 8 MB (bt=32) blocks at the fp B=128 geometry (measured
    # compile OOM, 2026-08-18) — tile under the 2 MB budget instead.  The
    # MC path (drop>0, arbitrary grid) keeps the measured-win tiling.
    budget = _VMEM_BLOCK_LIMIT_T if drop_rate > 0.0 else _VMEM_BLOCK_LIMIT
    bt = _batch_tile_t(B, per_sample, budget=budget)
    # layout-only under XLA's preferred activation layout (see docstrings)
    xt = jnp.transpose(x, (1, 2, 0, 3))
    idt = jnp.transpose(identity, (1, 2, 0, 3))
    map_spec = pl.BlockSpec((H, W, bt, C), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_epilogue_kernel_t, n_pix=H * W,
                          drop_rate=drop_rate),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,) int32
            map_spec,  # x
            map_spec,  # identity
            pl.BlockSpec((C, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct((H, W, B, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("arbitrary",) if drop_rate > 0.0 else ("parallel",)),
            vmem_limit_bytes=_VMEM_KERNEL_LIMIT,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, xt, idt, w1, b1, w2, b2)
    return jnp.transpose(out, (2, 0, 1, 3))


@functools.partial(jax.jit,
                   static_argnames=("drop_rate", "interpret"))
def _epilogue_pallas(seed, x, identity, w1, b1, w2, b2,
                     drop_rate: float = 0.0, interpret: bool = False):
    B, H, W, C = x.shape
    mid = w1.shape[1]
    per_sample = H * W * C * jnp.dtype(x.dtype).itemsize
    bt = _batch_tile(B, per_sample, budget=_VMEM_BLOCK_LIMIT)
    map_spec = pl.BlockSpec((bt, H, W, C), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_epilogue_kernel, n_pix=H * W,
                          drop_rate=drop_rate),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,) int32
            map_spec,  # x
            map_spec,  # identity
            pl.BlockSpec((C, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mid, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # the hardware PRNG stream is stateful -> grid order must be
            # fixed when dropout draws bits; the drop-free epilogue has no
            # cross-tile state, so let Mosaic pipeline/reorder the grid
            dimension_semantics=(
                ("arbitrary",) if drop_rate > 0.0 else ("parallel",)),
            vmem_limit_bytes=_VMEM_KERNEL_LIMIT,
        ),
        # the TPU-semantics interpreter (plain interpret=True lacks the TPU
        # PRNG primitives on CPU)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, x, identity, w1, b1, w2, b2)


def _make_epilogue_fn(drop_rate: float, interpret: bool,
                      use_t: bool = False):
    impl = _epilogue_pallas_t if use_t else _epilogue_pallas

    @jax.custom_batching.custom_vmap
    def fn(seed, x, identity, w1, b1, w2, b2):
        return impl(seed, x, identity, w1, b1, w2, b2,
                    drop_rate=drop_rate, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, seed, x, identity, w1, b1, w2, b2):
        s_b, x_b, id_b, *w_b = in_batched
        if not (x_b or id_b) or any(w_b):
            args = tuple(
                a if bb else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, bb in zip((seed, x, identity, w1, b1, w2, b2),
                                 in_batched)
            )
            return jax.lax.map(lambda t: fn(*t), args), True
        P = axis_size
        # one of x/identity may be unbatched — the MC predictor hoists the
        # deterministic prefix out of the pass vmap, so a block whose
        # residual input comes straight from the prefix sees an unbatched
        # identity.  Broadcasting + folding keeps the single fused grid;
        # the old lax.map fallback serialized P kernel launches here
        # (profiled: 2x 4.2 ms/step of while-loop at the 32^2x128 sites).
        if not x_b:
            x = jnp.broadcast_to(x, (P,) + x.shape)
        if not id_b:
            identity = jnp.broadcast_to(identity, (P,) + identity.shape)
        B, H, W, C = x.shape[1:]
        # fold the MC-pass axis into the batch; fold the per-pass seeds into
        # one tile-salted stream (distinct passes already occupy distinct
        # tiles of the folded batch, and the grid index salts the stream)
        seed0 = (seed.reshape(P, -1)[:, 0].sum().astype(jnp.int32)
                 if s_b else seed)
        out = fn(seed0.reshape(1) if seed0.ndim == 0 else seed0[:1],
                 x.reshape(P * B, H, W, C), identity.reshape(P * B, H, W, C),
                 w1, b1, w2, b2)
        return out.reshape(P, B, H, W, C), True

    return fn


_FNS = {}


def se_epilogue(x: jnp.ndarray, identity: jnp.ndarray,
                w1: jnp.ndarray, b1: jnp.ndarray,
                w2: jnp.ndarray, b2: jnp.ndarray,
                drop_rate: float = 0.0,
                rng: Optional[jax.Array] = None,
                interpret: bool = False) -> jnp.ndarray:
    """Fused ``SE(dropout(gelu(x + identity)))`` (serving path).

    ``x``/``identity``: (B, H, W, C); ``w1``: (C, mid); ``w2``: (mid, C).
    ``drop_rate>0`` requires ``rng`` (a JAX PRNG key — reduced to the
    hardware-PRNG seed).  Returns the scaled map only (ResLiteBlock
    discards the SE weight output; models/layers.py).
    """
    B, H, W, C = x.shape
    mid = w1.shape[1]
    if drop_rate > 0.0:
        if rng is None:
            raise ValueError("drop_rate > 0 requires rng")
        kd = (jax.random.key_data(rng)
              if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng)
        seed = kd.reshape(-1)[-1:].astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    # the layout-matched variant needs sublane-full (multiple-of-8) batch
    # tiles (see _batch_tile_t); when an 8-sample block exceeds the block
    # budget, or the batch can't tile by 8, use the (B,H,W,C) kernel
    per_sample = H * W * C * jnp.dtype(x.dtype).itemsize
    budget = _VMEM_BLOCK_LIMIT_T if drop_rate > 0.0 else _VMEM_BLOCK_LIMIT
    use_t = transposed() and (interpret or
                              (B % 8 == 0 and 8 * per_sample <= budget))
    key = (round(float(drop_rate), 8), bool(interpret), use_t)
    if key not in _FNS:
        _FNS[key] = _make_epilogue_fn(*key)
    return _FNS[key](
        seed, x, identity.astype(x.dtype),
        w1.astype(x.dtype), b1.reshape(1, mid).astype(x.dtype),
        w2.astype(x.dtype), b2.reshape(1, C).astype(x.dtype))

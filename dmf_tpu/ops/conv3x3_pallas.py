"""EXPERIMENTAL fused 3x3-conv + BN + GELU Pallas kernel (serving path).

Target: the profiled emitter outlier in fp serving (README "Performance
status"): XLA lowers the ``neck_f1_conv1`` 3x3 128->128 convolution at 64^2
(reference counterpart: the adapter-neck convs built at
/root/reference/code/model_module.py:552-618) with its
``EmitAllBatchInSublanes`` emitter at ~2.7 ms vs a ~1.0 ms conv roofline —
XLA's own cost model predicts the 2.85M cycles, i.e. it knows no better
emitter for this geometry.  ~3.7% of the fp serving step.

Design: one grid step per small batch tile with the WHOLE feature map
VMEM-resident.  The 3x3 window unrolls into 9 accumulated
(bt*H*W, Cin) x (Cin, Cout) MXU matmuls over shifted views of the padded
block — whole-map dots instead of the row-wise windowing the XLA emitter
picks here.  (A single 9*Cin-deep im2col matmul would be preferable, but
Mosaic rejects the lane-dim concat of shifted views: "offset mismatch on
non-concat dimension".)  The inference
epilogue — conv bias, BatchNorm running-stats affine, exact GELU — fuses
into the same pass: with conv bias ``b`` and BN ``(gamma, beta, mean,
var)``, the kernel applies ``gelu(conv(x) * s + t)`` where
``s = gamma/sqrt(var+eps)`` and ``t = (b - mean) * s + beta``.

Forward/serving only (training keeps the differentiable XLA path).
Dispatch follows the repo's measured-win kernel policy.  History of the
e2e verdicts (v5e, 2026-08-19):

- (B,H,W,C) kernel, all six sites: **646.0 vs 855.4 vol/s** fp (-24%) and
  **94.9 vs 111.2** TTA x MC (-15%) — the 5x in-context microbench win at
  the outlier site (4.68 -> 0.92 ms, scripts/bench_conv3x3.py) inverts
  end-to-end.  Same failure mode the (B,H,W,C) epilogue kernel exhibited
  before its layout-matched variant: the Mosaic custom call pins
  operands/results to the default ``{3,2,1,0}`` layout while XLA lays the
  surrounding activations out ``{3,0,2,1}``, so each kernel boundary pays
  relayout copies and un-fuses the neighboring chain, which the per-site
  marginal microbench cannot see.
- r4 sweep of the transposed ``(H,W,B,C)`` variant (``DMF_FUSED_NECK_T``,
  on by default; reachable at production geometries once the block budget
  was fixed to 8 MB): all six sites still lose (685.5 fp / 97.6 tta_mc),
  but the single profiled-outlier site ``neck_f1_conv1`` WINS both modes,
  reproduced over 3 interleaved baseline/kernel pairs — fp
  864.5/864.2/863.9 vs 855.8/856.1/855.1 (+1.0%), TTA x MC 111.5/111.5 vs
  110.8/110.7 (+0.6%).  The other five sites sit near roofline under XLA
  (final r3 profile: conv fusions tracking 82-100% of roofline), so the
  kernel's dispatch/boundary cost flips them.

**Default (r4): ON at ``neck_f1_conv1`` only** for single-device TPU /
shard_map-local serving; ``DMF_FUSED_NECK=0`` reverts,
``DMF_FUSED_NECK_SITES`` overrides the site allowlist.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_gates
from .se_pallas import _erf, _VMEM_KERNEL_LIMIT

# whole-map blocks: x block + fp32 accumulator + out block per grid step
_BLOCK_BUDGET = 2 * 1024 * 1024
# the transposed (H,W,bt,C) variant needs a sublane-full (8-sample) block,
# and every production neck geometry has per-sample maps >= 512 KB bf16
# (neck_f1: 1 MB at 64^2x128) — an 8-sample block is 8 MB there, so this
# budget mirrors epilogue_pallas._VMEM_BLOCK_LIMIT_T rather than
# _BLOCK_BUDGET (under which the variant would never dispatch at a real
# site and silently fall back to the (B,H,W,C) kernel)
_BLOCK_BUDGET_T = 8 * 1024 * 1024
# largest per-sample map the dispatch admits (bt=1 whole-map block)
_MAX_BLOCK = 8 * 1024 * 1024


def neck_enabled() -> bool:
    """Measured-win gate for the adapter-neck dispatch (models/adapter.py).

    Default ON for single-device TPU serving (and inside ``shard_map``
    bodies, where a Pallas call is a per-shard single-device program;
    multi-device GSPMD cannot partition the custom call, so it defaults
    OFF there — same rule as ``epilogue_pallas.enabled``).  The default
    follows the r4 e2e sweep (v5e, 2026-08-19, 3 repeat runs each): with
    the site default restricted to the profiled ``neck_f1_conv1`` outlier
    (see :func:`site_ok`) the kernel wins BOTH serving benches —
    fp 864.5/864.2/863.9 vs 855.8/856.1/855.1 baseline vol/s and
    TTA x MC 111.5/111.5 vs 110.8/110.7 — while all six sites lose
    (685.5 fp / 97.6 tta_mc).  ``DMF_FUSED_NECK=0|1`` overrides.
    """
    f = kernel_gates.flag("DMF_FUSED_NECK", "fused_neck")
    if f is not None:
        return f
    if jax.default_backend() != "tpu":
        return False
    from .epilogue_pallas import shard_local_active
    return jax.device_count() == 1 or shard_local_active()


# Measured winner of the r4 per-site sweep (module docstring): only the
# profiled emitter-outlier site wins e2e; "all"/comma-list override.
_DEFAULT_SITES = frozenset({"neck_f1_conv1"})


def site_ok(name: str) -> bool:
    """Per-site allowlist for the neck dispatch (``DMF_FUSED_NECK_SITES``).

    Unset resolves to the measured winner ``{'neck_f1_conv1'}`` — the
    geometry XLA's ``EmitAllBatchInSublanes`` emitter loses 2.7x on; the
    other five sites sit near roofline under XLA and the kernel's
    boundary cost flips them (r4 sweep: all sites 685 vs 856 fp vol/s).
    ``all`` dispatches at every geometry-eligible site; a comma-separated
    list (e.g. ``neck_f1_conv0,neck_f1_conv1``) restricts to named sites —
    the same sweep mechanism as the epilogue's ``DMF_FUSED_EPILOGUE_CH``,
    so per-site e2e measurement needs no code edits.
    """
    allow = kernel_gates.text("DMF_FUSED_NECK_SITES", "fused_neck_sites")
    if allow is None:
        return name in _DEFAULT_SITES
    allow = allow.strip()
    if not allow or allow.lower() == "all":
        return True
    return name in {p.strip() for p in allow.split(",") if p.strip()}


def geometry_ok(shape, cout: int, dtype) -> bool:
    """Dispatch eligibility: lane-aligned channels both sides and a
    whole feature map within the VMEM block cap."""
    if len(shape) != 4:
        return False
    b, h, w, cin = shape
    return (cin % 128 == 0 and cout % 128 == 0
            and h * w * cin * jnp.dtype(dtype).itemsize <= _MAX_BLOCK)


def transposed_enabled() -> bool:
    """Layout-matched ``(H,W,B,C)`` variant gate (``DMF_FUSED_NECK_T``,
    default on whenever the neck dispatch itself is enabled) — the same
    boundary-bitcast recipe that took the epilogue kernel from 96.5 to
    109.3 vol/s.  Falls back to the (B,H,W,C) kernel when no sublane-full
    batch tile divides B (mirroring the epilogue's per-call choice)."""
    f = kernel_gates.flag("DMF_FUSED_NECK_T", "fused_neck_transposed")
    return True if f is None else f


def _conv_kernel_t(x_ref, w_ref, s_ref, t_ref, out_ref, *, H: int, W: int):
    # (H,W,bt,C) blocks: the default layout of this logical shape IS the
    # {3,0,2,1} physical order XLA prefers for NHWC activations, so the
    # transposes at the pallas_call boundary elide to layout-only bitcasts
    # (see ops/epilogue_pallas.py for the measured diagnosis).  Window
    # shifts move the two *leading* (pixel) dims; the matmul collapses
    # them with the sublane batch tile — no lane-moving reshape.
    x = x_ref[...]  # (H, W, bt, Cin)
    bt, Cin = x.shape[2], x.shape[3]
    Cout = w_ref.shape[2]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0), (0, 0)))
    y = None
    for idx in range(9):
        dy, dx = divmod(idx, 3)
        sl = xp[dy:dy + H, dx:dx + W].reshape(H * W * bt, Cin)
        d = jnp.dot(sl, w_ref[idx], preferred_element_type=jnp.float32)
        y = d if y is None else y + d
    y = y * s_ref[...].astype(jnp.float32) + t_ref[...].astype(jnp.float32)
    y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))  # exact GELU
    out_ref[...] = y.astype(x.dtype).reshape(H, W, bt, Cout)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def _conv3x3_pallas_t(xt, wmat, s, t, bt: int, interpret: bool = False):
    H, W, B, Cin = xt.shape
    Cout = wmat.shape[2]
    return pl.pallas_call(
        functools.partial(_conv_kernel_t, H=H, W=W),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((H, W, bt, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, bt, Cout), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, B, Cout), xt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_KERNEL_LIMIT,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xt, wmat, s, t)


def _pick_bt_t(B: int, per_sample: int):
    """Sublane-legal batch tile for the (H,W,bt,C) blocks, or None
    → (B,H,W,C) fallback.

    Mosaic requires the second-minor block dim to be a multiple of 8 OR
    equal to the full array dim (the same rule epilogue_pallas's
    ``_batch_tile_t`` documents), so the choice is the largest
    multiple-of-8 divisor of ``B`` whose whole-map block fits
    ``_BLOCK_BUDGET_T``; a batch not divisible by 8 can only go
    whole-batch in one block (the full-dim escape hatch), admitted iff
    that fits the budget.
    """
    cap = _BLOCK_BUDGET_T // max(per_sample, 1)
    if B % 8:
        return B if 0 < B <= cap else None
    bt = min(B, (cap // 8) * 8)
    while bt >= 8 and B % bt:
        bt -= 8
    return bt if bt >= 8 else None


def _conv_kernel(x_ref, w_ref, s_ref, t_ref, out_ref, *, H: int, W: int):
    # Mosaic rejects a lane-dim concat of the 9 shifted views ("offset
    # mismatch on non-concat dimension"), so instead of one im2col matmul
    # the window is 9 accumulated (bt*H*W, Cin) x (Cin, Cout) dots — each
    # a single-contraction MXU matmul on a shifted slice of the padded
    # VMEM-resident block.
    x = x_ref[...]  # (bt, H, W, Cin)
    bt, _, _, Cin = x.shape
    Cout = w_ref.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = None
    for idx in range(9):
        dy, dx = divmod(idx, 3)
        sl = xp[:, dy:dy + H, dx:dx + W, :].reshape(bt * H * W, Cin)
        d = jnp.dot(sl, w_ref[idx], preferred_element_type=jnp.float32)
        y = d if y is None else y + d
    y = y * s_ref[...].astype(jnp.float32) + t_ref[...].astype(jnp.float32)
    y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))  # exact GELU
    out_ref[...] = y.astype(x.dtype).reshape(bt, H, W, Cout)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_pallas(x, wmat, s, t, interpret: bool = False):
    B, H, W, Cin = x.shape
    Cout = wmat.shape[2]
    per_sample = H * W * Cin * jnp.dtype(x.dtype).itemsize
    bt = max(1, min(B, _BLOCK_BUDGET // max(per_sample, 1)))
    while B % bt:
        bt -= 1
    return pl.pallas_call(
        functools.partial(_conv_kernel, H=H, W=W),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_KERNEL_LIMIT,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, wmat, s, t)


def conv3x3_bn_gelu(x: jnp.ndarray, kernel: jnp.ndarray,
                    conv_bias: jnp.ndarray,
                    bn_scale: jnp.ndarray, bn_bias: jnp.ndarray,
                    bn_mean: jnp.ndarray, bn_var: jnp.ndarray,
                    eps: float = 1e-5,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused ``gelu(batchnorm(conv3x3(x) + bias))`` inference segment.

    ``x``: (B, H, W, Cin) NHWC; ``kernel``: (3, 3, Cin, Cout) HWIO (flax
    layout); BN stats are the running (inference) moments.  SAME padding,
    stride 1, no dilation.  Numerics: fp32 accumulation + fp32 affine +
    exact GELU, cast to ``x.dtype`` on store — the same contract as the
    XLA chain it replaces.
    """
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    # (ky, kx) row-major tap index, matching the kernel's shift order
    wmat = kernel.reshape(9, Cin, Cout).astype(x.dtype)
    s = (bn_scale / jnp.sqrt(bn_var + eps)).astype(jnp.float32)
    t = ((conv_bias - bn_mean) * s + bn_bias).astype(jnp.float32)
    s, t = s.reshape(1, Cout), t.reshape(1, Cout)
    B, H, W, _ = x.shape
    if transposed_enabled():
        bt = _pick_bt_t(B, H * W * Cin * jnp.dtype(x.dtype).itemsize)
        if bt is not None:
            yt = _conv3x3_pallas_t(jnp.transpose(x, (1, 2, 0, 3)), wmat,
                                   s, t, bt=bt, interpret=interpret)
            return jnp.transpose(yt, (2, 0, 1, 3))
    return _conv3x3_pallas(x, wmat, s, t, interpret=interpret)

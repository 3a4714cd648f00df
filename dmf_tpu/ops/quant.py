"""Post-training int8 quantization for the serving path (opt-in).

The reference has no quantized inference; this is a TPU-native serving
feature: v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 rate (measured
~265 TOP/s vs ~156 TFLOP/s for the conv shapes in this model), and int8
activations halve the HBM traffic between layers — the dilated ResNet50
encoders (SURVEY.md §2.3) are both compute- and bandwidth-heavy.

Scheme (standard PTQ, chosen for zero calibration requirements):
  * weights: symmetric per-output-channel int8, quantized once offline;
  * activations: symmetric per-tensor *dynamic* int8 (abs-max each call —
    one fused reduction, negligible next to the conv);
  * accumulation in int32 (exact), dequant + bias in fp32 epilogue, which
    XLA fuses into the convolution.

Integration is a Flax *method interceptor* (`quantized_apply`): model code
is untouched — every bound ``nn.Conv`` whose kernel path appears in the
pre-quantized set is swapped for the int8 kernel at trace time.  Anything
not in the set (tiny convs, Dense heads, BN, attention) runs in the
original dtype.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# path-keyed set of quantized conv kernels:
#   {"/layer1_block0/conv1": {"kernel_q": int8 HWIO, "scale": (O,) f32}}
QuantSet = Dict[str, Dict[str, jnp.ndarray]]


def quantize_kernel_per_channel(
    kernel: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8 for an HWIO conv kernel."""
    k = np.asarray(kernel, np.float32)
    amax = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0)  # (O,)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def build_quant_set(
    params: Any,
    min_fan_in: int = 256,
    min_out: int = 32,
) -> QuantSet:
    """Walk a params pytree and pre-quantize every conv kernel big enough to
    win on the MXU (tiny convs lose more to the quant/dequant epilogue than
    the int8 matmul saves).  Returns a path-keyed QuantSet."""
    out: QuantSet = {}

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if keys[-1] != "kernel" or leaf.ndim != 4:
            continue  # conv kernels only (HWIO)
        h, w, i, o = leaf.shape
        if h * w * i < min_fan_in or o < min_out:
            continue
        q, scale = quantize_kernel_per_channel(np.asarray(leaf))
        mod_path = "/" + "/".join(str(k) for k in keys[:-1])
        out[mod_path] = {
            "kernel_q": jnp.asarray(q),
            "scale": jnp.asarray(scale),
        }
    return out


def _dynamic_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric dynamic int8: (x_q, scale).

    NOTE: the dynamic abs-max forces materializing x and re-reading it —
    two extra HBM passes per conv that eat most of the int8 MXU win
    (measured: +3.5% e2e vs +15% with static scales).  Prefer calibrated
    static scales (`calibrate_act_scales`); this is the calibration-free
    fallback.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def _static_quantize(x: jnp.ndarray, scale) -> jnp.ndarray:
    """Quantize with a precomputed scale — no reduction, so XLA fuses the
    round/clip/cast into the producer's epilogue and the conv reads int8."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)),
                  -127, 127)
    return xq.astype(jnp.int8)


def _canon_padding(conv: nn.Conv):
    """Resolve flax padding spec to explicit per-dim (lo, hi) pairs."""
    pad = conv.padding
    if isinstance(pad, str):
        return pad  # 'SAME'/'VALID' pass through to lax
    if isinstance(pad, int):  # flax allows a bare int
        return ((pad, pad), (pad, pad))
    out = []
    for p in pad:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


def _quant_conv_call(conv: nn.Conv, x: jnp.ndarray, q: Dict[str, jnp.ndarray],
                     bias: Optional[jnp.ndarray]) -> jnp.ndarray:
    """int8 replacement for nn.Conv.__call__ (NHWC, HWIO)."""
    kernel_q, w_scale = q["kernel_q"], q["scale"]
    kh, kw = kernel_q.shape[0], kernel_q.shape[1]
    strides = conv.strides or (1, 1)
    if isinstance(strides, int):
        strides = (strides, strides)
    dil = conv.kernel_dilation or (1, 1)
    if isinstance(dil, int):
        dil = (dil, dil)
    x_scale = q.get("x_scale")
    if x_scale is not None:
        xq = _static_quantize(x, x_scale)
    else:
        xq, x_scale = _dynamic_quantize(x)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC")
    )
    acc = jax.lax.conv_general_dilated(
        xq, kernel_q, window_strides=tuple(strides),
        padding=_canon_padding(conv),
        rhs_dilation=tuple(dil), dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * w_scale)  # (O,) broadcasts
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def quantized_apply(module: nn.Module, variables, qset: QuantSet,
                    *args, **kwargs):
    """``module.apply`` with every QuantSet conv swapped to int8.

    Uses flax's method interceptor so the model definition stays untouched;
    the bound module's ``.path`` keys into the pre-quantized set.
    """

    def interceptor(next_fun, iargs, ikwargs, context):
        m = context.module
        if (isinstance(m, nn.Conv) and context.method_name == "__call__"
                and m.feature_group_count == 1):
            # grouped/depthwise convs are excluded: _quant_conv_call runs a
            # dense lax conv and would silently mix channels across groups
            key = "/" + "/".join(str(p) for p in m.path)
            q = qset.get(key)
            if q is not None:
                bias = (m.variables["params"].get("bias")
                        if m.use_bias else None)
                return _quant_conv_call(m, iargs[0], q, bias)
        return next_fun(*iargs, **ikwargs)

    with nn.intercept_methods(interceptor):
        return module.apply(variables, *args, **kwargs)


def calibrate_act_scales(module: nn.Module, variables, qset: QuantSet,
                         *args, percentile: float = 100.0,
                         **kwargs) -> None:
    """Record a static activation scale for every quantized conv by running
    one fp forward on calibration data (eager, so values are concrete) and
    storing per-tensor abs-max (or the given percentile) into the QuantSet.

    Static scales are the difference between int8 breaking even and winning:
    with them the quantize fuses into the producer epilogue, conv inputs are
    read as int8 (half the HBM bytes), and no abs-max reduction runs.
    """
    def traced(variables, *targs):
        seen: Dict[str, jnp.ndarray] = {}

        def interceptor(next_fun, iargs, ikwargs, context):
            m = context.module
            if isinstance(m, nn.Conv) and context.method_name == "__call__":
                key = "/" + "/".join(str(p) for p in m.path)
                if key in qset:
                    x = jnp.abs(iargs[0].astype(jnp.float32))
                    amax = (jnp.max(x) if percentile >= 100.0
                            else jnp.percentile(x, percentile))
                    prev = seen.get(key)
                    seen[key] = amax if prev is None else jnp.maximum(prev,
                                                                      amax)
            return next_fun(*iargs, **ikwargs)

        with nn.intercept_methods(interceptor):
            module.apply(variables, *targs, **kwargs)
        return seen

    # jit so calibration runs as ONE compiled program (an eager forward
    # would dispatch each op separately — minutes over a remote TPU link)
    amaxes = jax.jit(traced)(variables, *args)
    for key, amax in amaxes.items():
        qset[key]["x_scale"] = jnp.float32(
            max(float(amax), 1e-12) / 127.0
        )


def make_quantized_fusion_apply(dwi_model, dce_model, fusion_model,
                                variables, calibration=None,
                                calibration_mc=False, calibration_rng=None,
                                **quant_kw):
    """Quantized mirror of train.fusion.make_fusion_apply's inference path.

    Pre-quantizes each submodel's conv kernels (separate QuantSets — the
    three models share module paths but not weights) and returns
    ``(apply_fn, qsets)`` where ``apply_fn(variables, dwi_x, dce_x)`` runs
    eval-mode int8 inference with the same return structure as the fp path.

    ``calibration_mc=True`` runs the calibration forwards with MC-dropout
    active (dropout rng from ``calibration_rng``): inverted-dropout scales
    kept activations by 1/(1-p), so scales calibrated with dropout OFF clip
    the top of the range when serving mc/tta_mc uncertainty inference.
    Calibration data must match the SERVED input distribution (i.e. already
    preprocessed volumes, not raw ones).
    """
    qsets = {
        "dwi": build_quant_set(variables["dwi"]["params"], **quant_kw),
        "dce": build_quant_set(variables["dce"]["params"], **quant_kw),
        "fusion": build_quant_set(variables["fusion"]["params"], **quant_kw),
    }
    if calibration is not None:
        dwi_x, dce_x = calibration
        rng = calibration_rng if calibration_rng is not None else (
            jax.random.PRNGKey(0))
        kw = dict(train=False, mc=calibration_mc,
                  rngs={"dropout": rng} if calibration_mc else None)
        calibrate_act_scales(dwi_model, variables["dwi"], qsets["dwi"],
                             dwi_x, **kw)
        _, d_aux, d_mask = jax.jit(
            lambda v, x: dwi_model.apply(v, x, **kw)
        )(variables["dwi"], dwi_x)
        calibrate_act_scales(dce_model, variables["dce"], qsets["dce"],
                             dce_x, **kw)
        _, c_aux, c_mask = jax.jit(
            lambda v, x: dce_model.apply(v, x, **kw)
        )(variables["dce"], dce_x)
        calibrate_act_scales(
            fusion_model, variables["fusion"], qsets["fusion"],
            d_aux["raw_feats"], c_aux["raw_feats"], d_mask, c_mask, **kw)

    def apply_fn(variables, dwi_x, dce_x, train=False, mc=False, rngs=None,
                 mutable=False):
        assert not train and not mutable, "quantized path is inference-only"
        kw = dict(train=False, mc=mc, rngs=rngs)
        d_logits, d_aux, d_mask = quantized_apply(
            dwi_model, variables["dwi"], qsets["dwi"], dwi_x, **kw)
        c_logits, c_aux, c_mask = quantized_apply(
            dce_model, variables["dce"], qsets["dce"], dce_x, **kw)
        logits, fused_mask, aux = quantized_apply(
            fusion_model, variables["fusion"], qsets["fusion"],
            d_aux["raw_feats"], c_aux["raw_feats"], d_mask, c_mask, **kw)
        parts = {"dwi_aux": d_aux, "dce_aux": c_aux,
                 "dwi_mask": d_mask, "dce_mask": c_mask}
        return logits, fused_mask, aux, parts, None

    return apply_fn, qsets


def make_quantized_fusion_fwd(dwi_model, dce_model, fusion_model, qsets):
    """Per-pass quantized fusion forward with the signature
    ``(dwi_vars, dce_vars, fusion_vars, dwi_x, dce_x, mc, rng) ->
    (logits, aux)`` — plugs into
    evals.predict.make_fusion_predictor(fwd_override=...) so TTA x
    MC-dropout uncertainty inference runs on the int8 serving path."""

    def fwd(dwi_vars, dce_vars, fusion_vars, dwi_x, dce_x, mc, rng,
            prefixes=None):
        from ..evals.predict import _dropout_key

        # ride the hardware bit-generator dropout keys like the fp default
        # and the hybrid fwd (DMF_MC_RBG, measured 92.5->96.1 on the fp
        # path) — without this the int8 ensemble silently reverted to
        # threefry VPU mask math AND drew a different dropout stream than
        # the fp path it is compared against
        rngs = {"dropout": _dropout_key(rng)} if rng is not None else None
        pre_d, pre_c = prefixes if prefixes is not None else (None, None)
        _, dwi_aux, dwi_mask = quantized_apply(
            dwi_model, dwi_vars, qsets["dwi"], dwi_x,
            train=False, mc=mc, rngs=rngs, prefix=pre_d)
        _, dce_aux, dce_mask = quantized_apply(
            dce_model, dce_vars, qsets["dce"], dce_x,
            train=False, mc=mc, rngs=rngs, prefix=pre_c)
        logits, fused_mask, aux = quantized_apply(
            fusion_model, fusion_vars, qsets["fusion"],
            dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_mask, dce_mask,
            train=False, mc=mc, rngs=rngs)
        return logits, aux

    def compute_prefixes(dwi_vars, dce_vars, dwi_x, dce_x):
        # the hoisted deterministic prefix runs on the SAME int8 kernels
        # (backbone convs are the biggest int8 win)
        return (
            quantized_apply(dwi_model, dwi_vars, qsets["dwi"], dwi_x,
                            train=False, prefix_only=True),
            quantized_apply(dce_model, dce_vars, qsets["dce"], dce_x,
                            train=False, prefix_only=True),
        )

    fwd.compute_prefixes = compute_prefixes
    return fwd


def make_hybrid_fusion_fwd(dwi_model, dce_model, fusion_model, qsets):
    """int8 deterministic prefix + fp stochastic suffix (hybrid serving).

    TTA x MC step anatomy (final r3 xplane profile, README): ~48% of the
    step is the hoisted deterministic prefix — modality SE + backbone +
    adapter necks, computed ONCE per ensemble — and its conv fusions
    already track 82-100% of the bf16 roofline, so the only way to shrink
    it further is a faster unit.  This fwd runs exactly that prefix on the
    int8 serving kernels (2x MXU rate, half the HBM bytes) while every
    stochastic MC pass — the part the uncertainty estimate is drawn from —
    stays bit-identical to the fp program (same rbg dropout keys, same
    fused epilogue kernels).  Accuracy surface: the int8 error enters only
    through the shared prefix features, identically for all 40 passes;
    ``bench.py --mode tta_mc --int8-prefix`` prints argmax agreement and
    max mean-prob/std error vs the fp ensemble on the same inputs + key.

    Plugs into ``evals.predict.make_fusion_predictor(fwd_override=...)``;
    in modes without a hoisted prefix (normal/tta) it degrades to the pure
    fp forward (no quantization), so use it only for mc/tta_mc.
    """

    def fwd(dwi_vars, dce_vars, fusion_vars, dwi_x, dce_x, mc, rng,
            prefixes=None):
        from ..evals.predict import _dropout_key

        rngs = {"dropout": _dropout_key(rng)} if rng is not None else None
        pre_d, pre_c = prefixes if prefixes is not None else (None, None)
        _, dwi_aux, dwi_mask = dwi_model.apply(
            dwi_vars, dwi_x, train=False, mc=mc, rngs=rngs, prefix=pre_d)
        _, dce_aux, dce_mask = dce_model.apply(
            dce_vars, dce_x, train=False, mc=mc, rngs=rngs, prefix=pre_c)
        logits, fused_mask, aux = fusion_model.apply(
            fusion_vars,
            dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_mask, dce_mask,
            train=False, mc=mc, rngs=rngs)
        return logits, aux

    def compute_prefixes(dwi_vars, dce_vars, dwi_x, dce_x):
        return (
            quantized_apply(dwi_model, dwi_vars, qsets["dwi"], dwi_x,
                            train=False, prefix_only=True),
            quantized_apply(dce_model, dce_vars, qsets["dce"], dce_x,
                            train=False, prefix_only=True),
        )

    fwd.compute_prefixes = compute_prefixes
    return fwd

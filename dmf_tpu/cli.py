"""Command-line driver: the run.py equivalent (run.py:121-180), as a real
CLI (the reference is a notebook-style script with shell magics).

Usage:
    python -m dmf_tpu.cli run            # full per-fold x per-method loop
    python -m dmf_tpu.cli run --folds 0 --methods dwi --epochs 5
    python -m dmf_tpu.cli run --fusion   # include the fusion stage
    python -m dmf_tpu.cli debug-suite    # pre-training smoke harness
    python -m dmf_tpu.cli bench --quick
    python -m dmf_tpu.cli export-ckpt --method dwi \
        --checkpoint results/.../best --out dwi_for_reference.ckpt
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--config", default=None, help="path to a config JSON")
    p.add_argument("--ref-params", default=None,
                   help="path to the reference's saved parameters dict "
                        "(parameters/parameters.pth, or a JSON dump of the "
                        "same layout); builds the Config via "
                        "from_reference_dict")
    p.add_argument("--base-path", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--min-epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--folds", type=int, nargs="*", default=None)
    p.add_argument("--methods", nargs="*", default=None)
    p.add_argument("--fusion", action="store_true",
                   help="run the fusion stage after both encoders "
                        "(the reference driver ships it commented out, "
                        "run.py:164-180)")
    p.add_argument("--no-compat", action="store_true",
                   help="disable reference_compat quirks")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--pretrained-dwi", default=None)
    p.add_argument("--pretrained-dce", default=None)
    p.add_argument("--debug-training", action="store_true")
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans (the reference's detect_anomaly, "
                        "train.py:88)")
    p.add_argument("--tiny", action="store_true",
                   help="shrink the models/geometry for smoke runs "
                        "(CPU-friendly)")
    p.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                   help="SPMD device mesh, e.g. '8' (8-way data parallel) "
                        "or '4x2' (4-way data, 2-way tensor parallel); "
                        "training shards the state and batches over it")
    p.add_argument("--parallel-folds", action="store_true",
                   help="train all requested folds of each modality as ONE "
                        "vmapped program (train/multifold_loop.py) instead "
                        "of the reference's sequential fold loop; per-fold "
                        "schedules/early-stop stay exact")
    p.add_argument("--mc-chunk", type=int, default=None,
                   help="run the MC uncertainty passes in sequential chunks "
                        "of this size (same ensemble, bounds activation "
                        "memory; evals/predict.py::_mc_map)")


def _load_reference_params(path: str):
    """Build a Config straight from the reference's saved ``parameters``
    artifact: the torch-pickled dict ``parameters_generate.py`` writes to
    ``parameters/parameters.pth`` (parameters_generate.py:303), or a JSON
    dump of the same layout."""
    from .config import from_reference_dict

    if path.endswith(".json"):
        with open(path) as f:
            return from_reference_dict(json.load(f))
    import torch

    try:
        d = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # the dict holds only python scalars/tuples, but older torch saves
        # may need full unpickling (the user's own artifact)
        d = torch.load(path, map_location="cpu", weights_only=False)
    return from_reference_dict(d)


def load_config(args):
    import dataclasses

    from .config import Config, default_parameters

    if getattr(args, "ref_params", None):
        cfg = _load_reference_params(args.ref_params)
    elif args.config:
        cfg = Config.load(args.config)
    else:
        cfg = default_parameters()
    updates = {}
    if args.base_path:
        updates["base_path"] = args.base_path
    if args.batch_size:
        updates["batch_size"] = args.batch_size
    if args.no_compat:
        updates["reference_compat"] = False
    if args.debug_nans:
        updates["debug_anomaly"] = True
    if getattr(args, "mc_chunk", None):
        updates["mc_chunk"] = args.mc_chunk
    if getattr(args, "mesh", None):
        part = args.mesh.lower().split("x")
        n_data = int(part[0])
        n_model = int(part[1]) if len(part) > 1 else 1
        updates["parallel"] = dataclasses.replace(
            cfg.parallel, mesh_shape=(n_data, n_model)
        )
    if getattr(args, "tiny", False):
        def shrink(mc):
            return dataclasses.replace(
                mc, channels=(8, 16, 32), input_size=32, use_backbone=False,
                proj_dim=8, transformer_embed_dim=32, transformer_depth=1,
                transformer_heads=2,
            )

        fs = dataclasses.replace(
            cfg.fusion_model.fusion_specific, fusion_channels=16,
            dwi_out_channels=32, dce_out_channels=32,
        )
        updates["dwi_model"] = shrink(cfg.dwi_model)
        updates["dce_model"] = shrink(cfg.dce_model)
        updates["fusion_model"] = dataclasses.replace(
            shrink(cfg.fusion_model), fusion_specific=fs
        )
        updates.setdefault("batch_size", args.batch_size or 8)
    if updates:
        cfg = cfg.replace(**updates)
    # install the config's serving-kernel knobs as process defaults
    # (env vars still override; ops/kernel_gates.py documents the order)
    from .ops import kernel_gates

    kernel_gates.configure(cfg.serving_kernels)
    return cfg


def cmd_run(args) -> int:
    import jax

    cfg = load_config(args)
    if cfg.debug_anomaly:
        jax.config.update("jax_debug_nans", True)

    folds = args.folds if args.folds is not None else list(range(cfg.segnum))
    methods = args.methods if args.methods else list(cfg.methods)

    from .pipeline.run_single import run_single_model, run_single_model_multifold
    from .pipeline.run_fusion import run_fusion_model

    summary = {}
    if getattr(args, "parallel_folds", False) and len(folds) > 1:
        # fold-parallel product path: each modality's K folds train as one
        # vmapped program; fusion (which chains per-fold encoder results)
        # then runs per fold
        per_method = {}
        for method in methods:
            if args.debug_training:
                from .debug_suite import run_debug_suite_single

                run_debug_suite_single(cfg, method)
            pretrained = (args.pretrained_dwi if method == "dwi"
                          else args.pretrained_dce)
            print(f"[dmf_tpu] folds {folds} method {method}: "
                  f"fold-parallel training...")
            per_method[method] = run_single_model_multifold(
                cfg, method, folds,
                num_epochs=args.epochs, min_epochs=args.min_epochs,
                base_dir=args.results_dir, pretrained_path=pretrained,
            )
        for fold in folds:
            results = {m: per_method[m][fold] for m in methods}
            for m, r in results.items():
                print(f"[dmf_tpu] fold {fold} {m} test:",
                      json.dumps(r["test_metrics"], indent=None))
                summary[f"fold{fold}_{m}"] = r["test_metrics"]
            if args.fusion and "dwi" in results and "dce" in results:
                print(f"[dmf_tpu] fold {fold} fusion: training...")
                fusion_res = run_fusion_model(
                    cfg, fold, results["dwi"], results["dce"],
                    num_epochs=args.epochs, min_epochs=args.min_epochs,
                    base_dir=args.results_dir,
                )
                print(f"[dmf_tpu] fold {fold} fusion test:",
                      json.dumps(fusion_res["test_metrics"], indent=None))
                summary[f"fold{fold}_fusion"] = fusion_res["test_metrics"]
        print(json.dumps(summary, indent=2))
        return 0
    for fold in folds:
        results = {}
        for method in methods:
            if args.debug_training:
                from .debug_suite import run_debug_suite_single

                run_debug_suite_single(cfg, method)
            pretrained = (args.pretrained_dwi if method == "dwi"
                          else args.pretrained_dce)
            print(f"[dmf_tpu] fold {fold} method {method}: training...")
            results[method] = run_single_model(
                cfg, method, fold,
                num_epochs=args.epochs, min_epochs=args.min_epochs,
                base_dir=args.results_dir, pretrained_path=pretrained,
            )
            print(f"[dmf_tpu] fold {fold} {method} test:",
                  json.dumps(results[method]["test_metrics"], indent=None))
        if args.fusion and "dwi" in results and "dce" in results:
            print(f"[dmf_tpu] fold {fold} fusion: training...")
            fusion_res = run_fusion_model(
                cfg, fold, results["dwi"], results["dce"],
                num_epochs=args.epochs, min_epochs=args.min_epochs,
                base_dir=args.results_dir,
            )
            print(f"[dmf_tpu] fold {fold} fusion test:",
                  json.dumps(fusion_res["test_metrics"], indent=None))
            summary[f"fold{fold}_fusion"] = fusion_res["test_metrics"]
        for m, r in results.items():
            summary[f"fold{fold}_{m}"] = r["test_metrics"]
    print(json.dumps(summary, indent=2))
    return 0


def cmd_debug_suite(args) -> int:
    cfg = load_config(args)
    from .debug_suite import run_debug_suite_fusion, run_debug_suite_single

    methods = args.methods if args.methods else list(cfg.methods)
    ok = True
    for method in methods:
        ok = run_debug_suite_single(cfg, method) and ok
    if args.fusion:
        ok = run_debug_suite_fusion(cfg) and ok
    return 0 if ok else 1


def cmd_bench(args) -> int:
    import subprocess

    cmd = [sys.executable, "bench.py"]
    if args.quick:
        cmd.append("--quick")
    return subprocess.call(cmd)


def cmd_export_ckpt(args) -> int:
    """Reverse migration: a dmf_tpu checkpoint -> reference Lightning ckpt(s)
    the genuine torch modules load with ``strict=True`` (models/ref_ckpt.py).

    ``--method dwi|dce`` exports one encoder; ``--method fusion`` takes a
    combined fusion TrainState and writes ``<stem>_{dwi,dce,fusion}.ckpt``.
    The config flags (``--config``/``--tiny``/...) must describe the same
    geometry the checkpoint was trained with.
    """
    import jax

    cfg = load_config(args)
    from .models.ref_ckpt import (
        export_reference_encoder,
        export_reference_fusion,
        save_lightning_ckpt,
    )
    from .pipeline.prepare_single import build_single_model
    from .train import TrainState
    from .utils.checkpoint import load_checkpoint

    if args.method in ("dwi", "dce"):
        _, variables, _ = build_single_model(cfg, args.method)
        state = load_checkpoint(
            args.checkpoint, jax.device_get(TrainState.create(variables)))
        sd = export_reference_encoder(
            {"params": state.params, "batch_stats": state.batch_stats})
        save_lightning_ckpt(args.out, sd)
        print(f"[dmf_tpu] wrote {args.out} ({len(sd)} tensors)")
        return 0

    # fusion: the combined TrainState carries dwi/dce/fusion subtrees
    from .pipeline.run_fusion import build_fusion_state

    dwi_model, dwi_vars, _ = build_single_model(cfg, "dwi")
    dce_model, dce_vars, _ = build_single_model(cfg, "dce")
    _, state = build_fusion_state(
        cfg, dwi_model, TrainState.create(dwi_vars),
        dce_model, TrainState.create(dce_vars),
    )
    state = load_checkpoint(args.checkpoint, jax.device_get(state))
    stem = args.out[:-len(".ckpt")] if args.out.endswith(".ckpt") else args.out
    exporters = {"dwi": export_reference_encoder,
                 "dce": export_reference_encoder,
                 "fusion": export_reference_fusion}
    for name, export in exporters.items():
        sd = export({"params": state.params[name],
                     "batch_stats": state.batch_stats[name]})
        path = f"{stem}_{name}.ckpt"
        save_lightning_ckpt(path, sd)
        print(f"[dmf_tpu] wrote {path} ({len(sd)} tensors)")
    return 0


def cmd_export_serving(args) -> int:
    """Package the fusion serving program as an AOT StableHLO artifact
    (dmf_tpu/serving.py).  The artifact deserializes and runs without any
    model code; weights ride as arguments (ship the checkpoint beside it).
    """
    import jax
    import jax.numpy as jnp

    cfg = load_config(args)
    from .pipeline.prepare_single import build_single_model
    from .pipeline.run_fusion import build_fusion_state
    from .serving import export_serving, make_serving_fn
    from .train import TrainState
    from .utils.checkpoint import load_checkpoint

    dwi_model, dwi_vars, _ = build_single_model(cfg, "dwi")
    dce_model, dce_vars, _ = build_single_model(cfg, "dce")
    fusion_model, state = build_fusion_state(
        cfg, dwi_model, TrainState.create(dwi_vars),
        dce_model, TrainState.create(dce_vars),
    )
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint, jax.device_get(state))

    fn = make_serving_fn(cfg, dwi_model, dce_model, fusion_model,
                         mode=args.mode, mc_chunk=cfg.mc_chunk)
    B, S = args.batch, cfg.dwi_model.input_size
    variables = {
        m: {"params": state.params[m], "batch_stats": state.batch_stats[m]}
        for m in ("dwi", "dce", "fusion")
    }
    example = (
        variables,
        jnp.zeros((B, S, S, cfg.dwi_channel_num), jnp.float32),
        jnp.zeros((B, S, S, cfg.dce_channel_num), jnp.float32),
        jnp.uint32(0),
    )
    platforms = tuple(args.platforms.split(","))
    data = export_serving(fn, example, path=args.out, platforms=platforms,
                          allow_tpu_kernels=args.allow_tpu_kernels)
    print(f"[dmf_tpu] wrote {args.out} ({len(data)} bytes, mode={args.mode}, "
          f"batch={B}, platforms={','.join(platforms)})")
    return 0


def _pin_platform() -> None:
    """Make JAX_PLATFORMS authoritative (the run.py:48-50 device-select
    equivalent).  Some TPU plugins force-register themselves and ignore the
    env var; re-assert it through jax.config before first backend use."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; keep whatever it picked


def main(argv=None) -> int:
    _pin_platform()
    parser = argparse.ArgumentParser(prog="dmf_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="train per-fold x per-method (+fusion)")
    _add_common(p_run)

    p_dbg = sub.add_parser("debug-suite", help="pre-training smoke harness")
    _add_common(p_dbg)

    p_bench = sub.add_parser("bench", help="fusion inference benchmark")
    p_bench.add_argument("--quick", action="store_true")

    p_exp = sub.add_parser(
        "export-ckpt",
        help="export a trained dmf_tpu checkpoint to reference Lightning "
             ".ckpt(s) the genuine torch modules load strict",
    )
    _add_common(p_exp)
    p_exp.add_argument("--method", required=True,
                       choices=["dwi", "dce", "fusion"])
    p_exp.add_argument("--checkpoint", required=True,
                       help="msgpack/Orbax dmf_tpu checkpoint (a reference "
                            ".ckpt also works for single encoders — that "
                            "round-trips it through our importer)")
    p_exp.add_argument("--out", required=True)

    p_srv = sub.add_parser(
        "export-serving",
        help="package the fusion serving program as an AOT StableHLO "
             "artifact (runs without model code; dmf_tpu/serving.py)",
    )
    _add_common(p_srv)
    p_srv.add_argument("--checkpoint", default=None,
                       help="combined fusion TrainState to bake the "
                            "geometry from (weights still ride as "
                            "arguments at serving time)")
    p_srv.add_argument("--out", required=True)
    p_srv.add_argument("--mode", default="normal",
                       choices=["normal", "tta", "mc", "tta_mc"])
    p_srv.add_argument("--batch", type=int, default=32,
                       help="served batch size (static shapes; export one "
                            "artifact per batch size)")
    p_srv.add_argument("--platforms", default="tpu,cpu",
                       help="comma-separated lowering targets")
    p_srv.add_argument("--allow-tpu-kernels", action="store_true",
                       help="permit the Mosaic custom call in the artifact "
                            "(required when exporting ON a TPU with the "
                            "fused serving kernels default-on; same-fleet "
                            "deployment artifact, not archival — see "
                            "serving.export_serving)")

    args = parser.parse_args(argv)
    if args.command == "run":
        return cmd_run(args)
    if args.command == "debug-suite":
        return cmd_debug_suite(args)
    if args.command == "bench":
        return cmd_bench(args)
    if args.command == "export-ckpt":
        return cmd_export_ckpt(args)
    if args.command == "export-serving":
        return cmd_export_serving(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())

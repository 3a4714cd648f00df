"""Typed, immutable configuration tree for the dmf_tpu framework.

TPU-native replacement for the reference's single mutable nested dict
(`/root/reference/code/parameters_generate.py:1-304`).  Two quirks of the
reference are deliberately designed out:

* the dwi / dce / fusion sub-dicts are *the same mutable object* in the
  reference (parameters_generate.py:174, 183) — here each modality gets an
  independent frozen dataclass;
* the backbone builder mutates the config at model-build time
  (foundation_model.py:515-536, 559-567) — here derived fields are resolved
  explicitly and purely by :func:`resolve_backbone_config`.

``default_parameters()`` reproduces every default of the reference config so
the two frameworks are knob-for-knob compatible, and ``to_dict``/``from_dict``
give a JSON round trip (the reference serialized with ``torch.save``;
parameters_generate.py:303).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

# ---------------------------------------------------------------------------
# Leaf configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ClassificationLossConfig:
    """Reference: parameters_generate.py:116-120."""

    loss_code: str = "wfl"  # 'fl' or 'wfl'
    gamma: float = 1.5
    alpha: Optional[float] = None  # computed from class frequencies for 'wfl'


@dataclass(frozen=True)
class MaskConfig:
    """Reference: parameters_generate.py:122-131."""

    enabled: bool = True
    mask_stage: str = "f2"  # 'f1' | 'f2' | 'f3'
    lambda_mask: float = 0.2
    mask_loss_type: str = "dice"  # 'dice' | 'dice_bce'
    mask_target_size: Tuple[int, int] = (32, 32)
    mask_fusion_attention: bool = True
    dice_weight: float = 0.5
    bce_weight: float = 0.5


@dataclass(frozen=True)
class OptimizerConfig:
    """Reference: parameters_generate.py:133-147."""

    name: str = "adamw"
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    amsgrad: bool = False
    weight_decay: float = 4e-5
    num_lr_groups: int = 3
    discriminative_lr: bool = True
    lr_decay_factor: float = 1.2
    discrim_on: str = "all"
    discriminative_reg: bool = True
    reg_decay_factor: float = 0.8
    reg_base: float = 1e-4


@dataclass(frozen=True)
class SchedulerConfig:
    """Reference: parameters_generate.py:148-164."""

    name: str = "reduce_lr_on_plateau"
    factor: float = 0.5
    patience: int = 35  # int(5 + 90/3)
    min_lr: float = 4e-7
    threshold: float = 1e-4
    monitor: str = "val_loss"
    t_max: int = 900
    eta_min: float = 0.0
    warmup_steps: int = 500
    max_steps: int = 10000


@dataclass(frozen=True)
class FusionSpecificConfig:
    """Reference: parameters_generate.py:185-194."""

    mha_heads: int = 4
    use_cross_attention: bool = True
    use_mask_attention: bool = True
    token_pool: Tuple[int, int] = (4, 4)
    fusion_channels: int = 128
    dwi_out_channels: int = 512
    dce_out_channels: int = 512
    fusion_recon_ch: int = 1


@dataclass(frozen=True)
class ModelConfig:
    """Per-modality model configuration.

    Reference: parameters_generate.py:64-171 (``dwi_model_parameters``; the
    dce and fusion dicts alias it).
    """

    input_size: int = 256

    # hybrid transformer final stage (transformer_model.py:137-175)
    use_hybrid_transformer: bool = False
    transformer_heads: int = 4
    transformer_patch_size: int = 2
    transformer_depth: int = 6
    transformer_embed_dim: int = 512

    dropout: float = 0.2

    channels: Tuple[int, int, int] = (128, 256, 512)
    repeat_blocks: Tuple[int, int, int] = (1, 1, 1)
    downsample: Tuple[bool, bool, bool] = (True, False, False)
    downsample_each_repeat: bool = False
    mid_squeeze: int = 2
    backbone_index_lists: Tuple[Tuple[int, ...], ...] = ()
    backbone_out_channels: Tuple[int, ...] = ()
    proj_dim: int = 64
    use_se: bool = True
    grad_clip: float = 5.0
    gradient_clip_algorithm: str = "norm"

    enable_modality_attention: bool = True
    use_backbone: bool = True
    use_input_adapt: bool = False
    use_advanced_adapt: bool = False
    transformer_backbone: bool = False
    backbone_str: str = "radimagenet"

    label_smoothing_enabled: bool = True
    label_smoothing_alpha: float = 0.1

    mimic_enabled: bool = True
    lambda_mimic: float = 0.2

    recon_enabled: bool = True
    reconstruction_loss_code: str = "mse"
    lambda_recon: float = 0.1

    classification_loss: ClassificationLossConfig = field(
        default_factory=ClassificationLossConfig
    )
    mask: MaskConfig = field(default_factory=MaskConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)

    attn_reg_enabled: bool = False
    lambda_attn_energy: float = 1e-4
    lambda_feature_consistency: float = 1e-4
    feat_norm_reg_enabled: bool = True
    lambda_feat_norm: float = 4e-5

    # TPU-native extras (no reference counterpart)
    # rematerialize encoder blocks in the backward pass (trade FLOPs for
    # HBM, enabling larger train batches)
    remat: bool = False

    fusion_specific: FusionSpecificConfig = field(
        default_factory=FusionSpecificConfig
    )


@dataclass(frozen=True)
class EarlyStoppingConfig:
    """Reference: parameters_generate.py:199-204."""

    metric: str = "val_roc_auc"
    mode: str = "max"
    patience: int = 90
    min_delta: float = 1e-4


@dataclass(frozen=True)
class ServingKernelConfig:
    """Serving-kernel and preprocessing knobs — the Config face of the
    gate registry (``dmf_tpu.ops.kernel_gates``); no reference counterpart
    (the reference has no serving kernels, SURVEY.md §2.11).

    Every field defaults to ``None`` = "use the measured-winner default
    baked into the gate function" (platform-aware, e.g. the fused epilogue
    is on for single-device TPU only).  A non-``None`` value overrides
    that default for the whole process once ``kernel_gates.configure``
    runs (cli.py/bench.py do this after building the Config); the knob's
    env var still overrides BOTH for one-off sweeps.  The README
    "Serving kernel knobs" table lists each knob, its default, and the
    e2e measurement that set it.
    """

    # residual+GELU+dropout+SE Pallas epilogue on MC-dropout passes
    # (DMF_FUSED_EPILOGUE; default: on for 1-device TPU / shard_map body)
    fused_epilogue: Optional[bool] = None
    # same kernel on drop-free eval forwards (DMF_FUSED_EPILOGUE_EVAL;
    # default off: XLA's conv co-fusion wins e2e)
    fused_epilogue_eval: Optional[bool] = None
    # layout-matched (H,W,B,C) epilogue variant (DMF_FUSED_EPILOGUE_T;
    # default on: boundary transposes elide to bitcasts)
    fused_epilogue_transposed: Optional[bool] = None
    # epilogue site allowlist by channel width (DMF_FUSED_EPILOGUE_CH;
    # 'all' or comma list; default: all sites transposed, '512' otherwise)
    fused_epilogue_channels: Optional[str] = None
    # SE-only Pallas kernel (DMF_FUSED_SE; default off: measured regression)
    fused_se: Optional[bool] = None
    # fused 3x3-conv+BN+GELU adapter necks (DMF_FUSED_NECK; default on for
    # 1-device TPU / shard_map body — r4 sweep win at the default site)
    fused_neck: Optional[bool] = None
    # layout-matched (H,W,B,C) neck variant (DMF_FUSED_NECK_T; default on
    # whenever the neck dispatch is enabled)
    fused_neck_transposed: Optional[bool] = None
    # neck site allowlist (DMF_FUSED_NECK_SITES; 'all' or comma list of
    # neck_f{1..3}_conv{0,1}; default 'neck_f1_conv1' — the profiled
    # emitter outlier, the only site that measured an e2e win)
    fused_neck_sites: Optional[str] = None
    # hardware-bit-generator dropout keys in the MC vmap (DMF_MC_RBG;
    # default: on on TPU)
    mc_rbg: Optional[bool] = None
    # Nyul landmark percentiles from every k-th pixel (DMF_NYUL_STRIDE;
    # default 1 = exact; the serving bench uses 4, agreement 1.00)
    nyul_stride: Optional[int] = None
    # Pallas flash-attention dispatch (DMF_FLASH_ATTN; default: auto —
    # on-TPU when N >= 512 and block-aligned, ops/attention.py; False
    # forces the fused-XLA einsum path for A/B measurement)
    flash_attention: Optional[bool] = None


@dataclass(frozen=True)
class ParallelConfig:
    """TPU mesh layout — no reference counterpart (reference is single-GPU,
    SURVEY.md §2.10); designed for v5e-8 per BASELINE.json."""

    data_axis: str = "data"
    model_axis: str = "model"
    # mesh shape (data, model); (n_devices, 1) = pure DP
    mesh_shape: Optional[Tuple[int, int]] = None
    donate_train_state: bool = True


@dataclass(frozen=True)
class Config:
    """Top-level experiment configuration (reference: parameters_generate.py)."""

    dim: int = 2
    compile: bool = True  # jit is always on; kept for API parity
    dataloader_num_workers: int = 11

    debug_training: bool = True
    debug_val: bool = True
    backbone_debug: bool = False
    full_debug: bool = False
    debug_anomaly: bool = False  # maps to jax_debug_nans
    # route train-batch assembly through the C++ prefetch loader
    # (native/dmf_native.cpp; the reference's num_workers=11 analogue,
    # prepare_single_model.py:141); silently falls back to the Python
    # path when the library is unavailable
    use_native_loader: bool = False
    # stage whole train/val splits into HBM once and gather batches on
    # device (data/pipeline.py::stage_dataset_to_device) — removes the
    # per-step host->device batch transfer, which capped the fit loop at
    # 0.2 steps/s on the tunneled v5e (vs 6.2 bare-step).  None = auto:
    # on for TPU backends when the split is < 4 GiB; mesh runs keep the
    # sharded host-prefetch path either way
    device_data: Optional[bool] = None

    num_epochs: int = 900
    batch_size: int = 32
    segnum: int = 5
    class_num: int = 4
    methods: Tuple[str, ...] = ("dwi", "dce")
    namelist: Tuple[str, ...] = ("train", "val", "test")

    control_metric: str = "val_loss"
    early_stop_metric: str = "val_roc_auc"
    patience: int = 90
    save_dir: str = "logs"

    forced_mask_size: int = 32

    dwi_model: ModelConfig = field(default_factory=ModelConfig)
    dce_model: ModelConfig = field(default_factory=ModelConfig)
    fusion_model: ModelConfig = field(default_factory=ModelConfig)

    early_stopping: EarlyStoppingConfig = field(default_factory=EarlyStoppingConfig)

    # AMP: TPU-native equivalent of '16-mixed' is bfloat16 compute
    precision: str = "bf16-mixed"

    test_mode: str = "tta_mc"  # 'normal' | 'tta' | 'mc' | 'tta_mc'
    mc_passes: int = 10
    # run the MC pass axis in sequential chunks of this many fused passes
    # (evals/predict.py::_mc_map): identical ensemble, ~passes/chunk times
    # less live activation memory.  None = single vmap over all passes.
    mc_chunk: Optional[int] = None

    backbone_freeze_on_start: bool = True
    backbone_num_groups: int = 3
    unfreeze_timer: int = 40
    foundation_model_unfreeze_timer: int = 40
    backbone_unfreeze_lr: float = 1e-5  # = dwi lr * 0.1
    backbone_unfreeze_wd: float = 1e-5  # = reg_base * 0.1
    foundation_model_unfreeze_lr: float = 1e-5
    backbone_unfreeze_lr_factor: float = 0.25

    use_simple_aux_loss_scheduling: bool = True

    dwi_bvals_to_use: Tuple[int, ...] = tuple(range(13))
    dce_channels_to_use: Tuple[int, ...] = tuple(range(6))
    dwi_add_adc_map: bool = True

    base_path: str = "data/"
    seed: int = 42

    # Faithfully reproduce reference loss quirks (double lambda*aux_w
    # application, train.py:397-400 + 462-464; shared per-split ADC map,
    # prepare_single_model.py:319-332; fusion sample-pair mimic,
    # train_fusion.py:291-296).  Set False for the corrected semantics.
    reference_compat: bool = True

    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    # serving kernel/preproc knobs (kernel_gates.configure installs them)
    serving_kernels: ServingKernelConfig = field(
        default_factory=ServingKernelConfig)

    # ------------------------------------------------------------------
    # Derived fields (reference computes these imperatively)
    # ------------------------------------------------------------------
    @property
    def dwi_base_channel_num(self) -> int:
        return len(self.dwi_bvals_to_use)

    @property
    def dwi_channel_num(self) -> int:
        # parameters_generate.py:246-249
        return self.dwi_base_channel_num + (1 if self.dwi_add_adc_map else 0)

    @property
    def dce_channel_num(self) -> int:
        return len(self.dce_channels_to_use)

    def channel_num(self, method: str) -> int:
        if method == "dwi":
            return self.dwi_channel_num
        if method == "dce":
            return self.dce_channel_num
        raise ValueError(f"unknown method {method!r}")

    def model_config(self, method: str) -> ModelConfig:
        if method == "dwi":
            return self.dwi_model
        if method == "dce":
            return self.dce_model
        if method == "fusion":
            return self.fusion_model
        raise ValueError(f"unknown method {method!r}")

    @property
    def aux_loss_weight_epoch_limit(self) -> int:
        # parameters_generate.py:233
        return max(100, self.unfreeze_timer * (self.backbone_num_groups + 2))

    @property
    def min_epochs(self) -> int:
        # parameters_generate.py:254-261
        m = self.patience * 3
        if self.backbone_freeze_on_start:
            m = max(m, self.unfreeze_timer * (self.backbone_num_groups + 1))
        if self.use_simple_aux_loss_scheduling:
            m = max(m, self.aux_loss_weight_epoch_limit + 1)
        return int(max(m, self.num_epochs / 3))

    # ------------------------------------------------------------------
    # Serialization
    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=_json_default)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return _from_dict(cls, d)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _json_default(o):
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(type(o))


def _from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kw = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in hints:
            continue
        f = hints[k]
        t = f.type
        if dataclasses.is_dataclass(_resolve(t)) and isinstance(v, dict):
            kw[k] = _from_dict(_resolve(t), v)
        elif isinstance(v, list):
            kw[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        else:
            kw[k] = v
    return cls(**kw)


_DATACLASS_TYPES = {
    "ClassificationLossConfig": ClassificationLossConfig,
    "MaskConfig": MaskConfig,
    "OptimizerConfig": OptimizerConfig,
    "SchedulerConfig": SchedulerConfig,
    "FusionSpecificConfig": FusionSpecificConfig,
    "ModelConfig": ModelConfig,
    "EarlyStoppingConfig": EarlyStoppingConfig,
    "ParallelConfig": ParallelConfig,
    "ServingKernelConfig": ServingKernelConfig,
}


def _resolve(t):
    if isinstance(t, str):
        return _DATACLASS_TYPES.get(t, t)
    return t


# ---------------------------------------------------------------------------
# Backbone-derived config resolution (replaces in-place config mutation at
# foundation_model.py:515-536, 559-567)
# ---------------------------------------------------------------------------

_BACKBONE_DERIVED = {
    # foundation_model.py:515-523 (imagenet resnets)
    "resnet50": dict(
        backbone_index_lists=((0,), (1,), (2, 3)),
        downsample=(True, False, False),
        downsample_each_repeat=False,
    ),
    "resnet50d": dict(
        backbone_index_lists=((0,), (1,), (2, 3)),
        downsample=(True, False, False),
        downsample_each_repeat=False,
    ),
    # foundation_model.py:559-567 (radimagenet resnet50)
    "radimagenet": dict(
        backbone_index_lists=((0,), (1,), (2, 3)),
        downsample=(True, False, False),
        downsample_each_repeat=False,
    ),
    # foundation_model.py:527-536 (vit/dino)
    "vit_base_patch16_224": dict(
        backbone_index_lists=((0, 1, 2), (3, 4, 5, 6), (7, 8, 9, 10, 11)),
        downsample=(False, False, False),
        channels=(768, 768, 768),
        transformer_backbone=True,
    ),
    "dino_vitbase16_pretrain": dict(
        backbone_index_lists=((0, 1, 2), (3, 4, 5, 6), (7, 8, 9, 10, 11)),
        downsample=(False, False, False),
        channels=(768, 768, 768),
        transformer_backbone=True,
    ),
}


def resolve_backbone_config(mc: ModelConfig) -> ModelConfig:
    """Return a ModelConfig with backbone-derived fields resolved.

    Pure replacement for the reference's mutation of the parameters dict at
    backbone-build time (foundation_model.py:490-573).  Idempotent.
    """
    if not mc.use_backbone:
        return mc
    derived = _BACKBONE_DERIVED.get(mc.backbone_str.lower())
    if derived is None:
        raise ValueError(f"unknown backbone_str {mc.backbone_str!r}")
    return dataclasses.replace(mc, **derived)


def default_parameters(**overrides) -> Config:
    """Build the default configuration (mirrors parameters_generate.py)."""
    return Config(**overrides)


# ---------------------------------------------------------------------------
# Reference-style nested-dict view, for users migrating from the reference
# ---------------------------------------------------------------------------

def to_reference_dict(cfg: Config) -> Dict[str, Any]:
    """Render a Config as the reference's nested ``parameters`` dict layout
    (keys per parameters_generate.py) for drop-in inspection/migration."""

    def model_params(mc: ModelConfig) -> Dict[str, Any]:
        return {
            "input_size": mc.input_size,
            "use_hybrid_transformer": mc.use_hybrid_transformer,
            "transformer_heads": mc.transformer_heads,
            "transformer_patch_size": mc.transformer_patch_size,
            "transformer_depth": mc.transformer_depth,
            "transformer_embed_dim": mc.transformer_embed_dim,
            "dropout": mc.dropout,
            "channels": tuple(mc.channels),
            "repeat_blocks": tuple(mc.repeat_blocks),
            "downsample": tuple(mc.downsample),
            "downsample_each_repeat": mc.downsample_each_repeat,
            "mid_squeeze": mc.mid_squeeze,
            "backbone_index_lists": [list(c) for c in mc.backbone_index_lists],
            "backbone_out_channels": tuple(mc.backbone_out_channels),
            "proj_dim": mc.proj_dim,
            "use_se": mc.use_se,
            "grad_clip": mc.grad_clip,
            "gradient_clip_algorithm": mc.gradient_clip_algorithm,
            "enable_modality_attention": mc.enable_modality_attention,
            "use_backbone": mc.use_backbone,
            "use_input_adapt": mc.use_input_adapt,
            "use_advanced_adapt": mc.use_advanced_adapt,
            "transformer_backbone": mc.transformer_backbone,
            "backbone_str": mc.backbone_str,
            "label_smoothing_enabled": mc.label_smoothing_enabled,
            "label_smoothing_alpha": mc.label_smoothing_alpha,
            "mimic_enabled": mc.mimic_enabled,
            "lambda_mimic": mc.lambda_mimic,
            "recon_enabled": mc.recon_enabled,
            "reconstruction_loss_code": mc.reconstruction_loss_code,
            "lambda_recon": mc.lambda_recon,
            "classification_loss_parameters": {
                "classification_loss_code": mc.classification_loss.loss_code,
                "gamma": mc.classification_loss.gamma,
                "alpha": mc.classification_loss.alpha,
            },
            "mask_parameters": {
                "mask": mc.mask.enabled,
                "mask_stage": mc.mask.mask_stage,
                "lambda_mask": mc.mask.lambda_mask,
                "mask_loss_type": mc.mask.mask_loss_type,
                "mask_target_size": tuple(mc.mask.mask_target_size),
                "mask_fusion_attention": mc.mask.mask_fusion_attention,
                "dice_weight": mc.mask.dice_weight,
                "bce_weight": mc.mask.bce_weight,
            },
            "optimizer_parameters": {
                "name": mc.optimizer.name,
                "lr": mc.optimizer.lr,
                "betas": tuple(mc.optimizer.betas),
                "eps": mc.optimizer.eps,
                "amsgrad": mc.optimizer.amsgrad,
                "weight_decay": mc.optimizer.weight_decay,
                "num_lr_groups": mc.optimizer.num_lr_groups,
                "discriminative_lr": mc.optimizer.discriminative_lr,
                "lr_decay_factor": mc.optimizer.lr_decay_factor,
                "discrim_on": mc.optimizer.discrim_on,
                "discriminative_reg": mc.optimizer.discriminative_reg,
                "reg_decay_factor": mc.optimizer.reg_decay_factor,
                "reg_base": mc.optimizer.reg_base,
            },
            "scheduler": {
                "name": mc.scheduler.name,
                "factor": mc.scheduler.factor,
                "patience": mc.scheduler.patience,
                "min_lr": mc.scheduler.min_lr,
                "threshold": mc.scheduler.threshold,
                "monitor": mc.scheduler.monitor,
                "T_max": mc.scheduler.t_max,
                "eta_min": mc.scheduler.eta_min,
                "warmup_steps": mc.scheduler.warmup_steps,
                "max_steps": mc.scheduler.max_steps,
            },
            "attn_reg_enabled": mc.attn_reg_enabled,
            "lambda_attn_energy": mc.lambda_attn_energy,
            "lambda_feature_consistency": mc.lambda_feature_consistency,
            "feat_norm_reg_enabled": mc.feat_norm_reg_enabled,
            "lambda_feat_norm": mc.lambda_feat_norm,
        }

    fusion = model_params(cfg.fusion_model)
    fs = cfg.fusion_model.fusion_specific
    fusion["fusion_specific_parameters"] = {
        "mha_heads": fs.mha_heads,
        "use_cross_attention": fs.use_cross_attention,
        "use_mask_attention": fs.use_mask_attention,
        "token_pool": tuple(fs.token_pool),
        "fusion_channels": fs.fusion_channels,
        "dwi_out_channels": fs.dwi_out_channels,
        "dce_out_channels": fs.dce_out_channels,
        "fusion_recon_ch": fs.fusion_recon_ch,
    }

    return {
        "dim": cfg.dim,
        "compile": cfg.compile,
        "dataloader_num_workers": cfg.dataloader_num_workers,
        "debug_training": cfg.debug_training,
        "debug_val": cfg.debug_val,
        "backbone_debug": cfg.backbone_debug,
        "full_debug": cfg.full_debug,
        "debug_anomaly": cfg.debug_anomaly,
        "num_epochs": cfg.num_epochs,
        "batch_size": cfg.batch_size,
        "segnum": cfg.segnum,
        "class_num": cfg.class_num,
        "methods": list(cfg.methods),
        "namelist": list(cfg.namelist),
        "control_metric": cfg.control_metric,
        "early_stop_metric": cfg.early_stop_metric,
        "patience": cfg.patience,
        "save_dir": cfg.save_dir,
        "forced_mask_size": cfg.forced_mask_size,
        "dwi_model_parameters": model_params(cfg.dwi_model),
        "dce_model_parameters": model_params(cfg.dce_model),
        "fusion_model_parameters": fusion,
        "early_stopping_parameters": {
            "metric": cfg.early_stopping.metric,
            "mode": cfg.early_stopping.mode,
            "patience": cfg.early_stopping.patience,
            "min_delta": cfg.early_stopping.min_delta,
        },
        "precision": cfg.precision,
        "test_mode": cfg.test_mode,
        "mc_passes": cfg.mc_passes,
        "backbone_freeze_on_start": cfg.backbone_freeze_on_start,
        "backbone_num_groups": cfg.backbone_num_groups,
        "unfreeze_timer": cfg.unfreeze_timer,
        "foundation_model_unfreeze_timer": cfg.foundation_model_unfreeze_timer,
        "backbone_unfreeze_lr": cfg.backbone_unfreeze_lr,
        "backbone_unfreeze_wd": cfg.backbone_unfreeze_wd,
        "foundation_model_unfreeze_lr": cfg.foundation_model_unfreeze_lr,
        "backbone_unfreeze_lr_factor": cfg.backbone_unfreeze_lr_factor,
        "use_simple_aux_loss_scheduling": cfg.use_simple_aux_loss_scheduling,
        "aux_loss_weight_epoch_limit": cfg.aux_loss_weight_epoch_limit,
        "dwi_bvals_to_use": tuple(cfg.dwi_bvals_to_use),
        "dce_channels_to_use": tuple(cfg.dce_channels_to_use),
        "dwi_add_adc_map": cfg.dwi_add_adc_map,
        "dwi_base_channel_num": cfg.dwi_base_channel_num,
        "dwi_channel_num": cfg.dwi_channel_num,
        "dce_channel_num": cfg.dce_channel_num,
        "min_epochs": cfg.min_epochs,
        "base_path": cfg.base_path,
    }


# ---------------------------------------------------------------------------
# Inverse: build a Config FROM the reference's ``parameters`` dict
# ---------------------------------------------------------------------------

# keys the reference computes from other keys (parameters_generate.py:262-283);
# ours are @property-derived, so they are ignored on import
_REF_DERIVED_KEYS = frozenset({
    "dwi_base_channel_num", "dwi_channel_num", "dce_channel_num",
    "min_epochs", "aux_loss_weight_epoch_limit",
})

# environment bookkeeping the reference stores alongside the hyperparameters
# (parameters_generate.py:285-304): artifact paths + a dataloader key suffix
_REF_ENV_KEYS = frozenset({
    "masks_path", "nyul_path", "data_path", "model_dict_path",
    "fusion_model_dict", "data_key_mod", "finetune_num_epochs",
    "dwi_tensordata", "dce_tensordata", "labels_tensordata",
    "dwi_test_tensordata", "dce_test_tensordata", "labels_test_tensordata",
})


def _take(dst_kw: Dict[str, Any], src: Any, field_name: str,
          src_key: Optional[str] = None, conv=None) -> None:
    key = src_key or field_name
    if isinstance(src, dict) and key in src:
        v = src[key]
        dst_kw[field_name] = conv(v) if conv is not None else v


def _model_from_reference(mp: Dict[str, Any]) -> ModelConfig:
    kw: Dict[str, Any] = {}
    for name in (
        "input_size", "use_hybrid_transformer", "transformer_heads",
        "transformer_patch_size", "transformer_depth", "transformer_embed_dim",
        "dropout", "downsample_each_repeat", "mid_squeeze", "proj_dim",
        "use_se", "grad_clip", "gradient_clip_algorithm",
        "enable_modality_attention", "use_backbone", "use_input_adapt",
        "use_advanced_adapt", "transformer_backbone", "backbone_str",
        "label_smoothing_enabled", "label_smoothing_alpha",
        "mimic_enabled", "lambda_mimic", "recon_enabled",
        "reconstruction_loss_code", "lambda_recon",
        "attn_reg_enabled", "lambda_attn_energy",
        "lambda_feature_consistency", "feat_norm_reg_enabled",
        "lambda_feat_norm",
    ):
        _take(kw, mp, name)
    for name in ("channels", "repeat_blocks", "downsample",
                 "backbone_out_channels"):
        _take(kw, mp, name, conv=tuple)
    _take(kw, mp, "backbone_index_lists",
          conv=lambda v: tuple(tuple(x) for x in v))

    cl = mp.get("classification_loss_parameters")
    if isinstance(cl, dict):
        ckw: Dict[str, Any] = {}
        _take(ckw, cl, "loss_code", src_key="classification_loss_code")
        _take(ckw, cl, "gamma")
        _take(ckw, cl, "alpha")
        kw["classification_loss"] = ClassificationLossConfig(**ckw)

    mk = mp.get("mask_parameters")
    if isinstance(mk, dict):
        mkw: Dict[str, Any] = {}
        _take(mkw, mk, "enabled", src_key="mask")
        for name in ("mask_stage", "lambda_mask", "mask_loss_type",
                     "mask_fusion_attention", "dice_weight", "bce_weight"):
            _take(mkw, mk, name)
        _take(mkw, mk, "mask_target_size", conv=tuple)
        kw["mask"] = MaskConfig(**mkw)

    op = mp.get("optimizer_parameters")
    if isinstance(op, dict):
        okw: Dict[str, Any] = {}
        # the reference spells it 'adamW' (parameters_generate.py:134)
        _take(okw, op, "name", conv=lambda s: str(s).lower())
        for name in ("lr", "eps", "amsgrad", "weight_decay", "num_lr_groups",
                     "discriminative_lr", "lr_decay_factor", "discrim_on",
                     "discriminative_reg", "reg_decay_factor", "reg_base"):
            _take(okw, op, name)
        _take(okw, op, "betas", conv=tuple)
        kw["optimizer"] = OptimizerConfig(**okw)

    sc = mp.get("scheduler")
    if isinstance(sc, dict):
        skw: Dict[str, Any] = {}
        for name in ("name", "factor", "patience", "min_lr", "threshold",
                     "monitor", "eta_min", "warmup_steps", "max_steps"):
            _take(skw, sc, name)
        _take(skw, sc, "t_max", src_key="T_max")
        kw["scheduler"] = SchedulerConfig(**skw)

    fs = mp.get("fusion_specific_parameters")
    if isinstance(fs, dict):
        fkw: Dict[str, Any] = {}
        for name in ("mha_heads", "use_cross_attention", "use_mask_attention",
                     "fusion_channels", "dwi_out_channels",
                     "dce_out_channels", "fusion_recon_ch"):
            _take(fkw, fs, name)
        _take(fkw, fs, "token_pool", conv=tuple)
        kw["fusion_specific"] = FusionSpecificConfig(**fkw)

    return ModelConfig(**kw)


def from_reference_dict(d: Dict[str, Any], **overrides) -> Config:
    """Build a :class:`Config` from the reference's nested ``parameters``
    dict — the exact layout ``parameters_generate.py`` builds and
    ``torch.save``\\ s to ``parameters/parameters.pth``
    (/root/reference/code/parameters_generate.py:1-304).  Inverse of
    :func:`to_reference_dict`.

    Migration semantics:

    * **Derived keys are ignored** (``dwi_channel_num``, ``min_epochs``,
      ``aux_loss_weight_epoch_limit``, ...): the reference computes them
      imperatively from other keys; here they are ``@property``-derived
      from the same inputs, so they always agree by construction.
    * **Environment bookkeeping is ignored** (tensor-store paths,
      ``data_key_mod``): only ``base_path``/``save_dir`` carry over; the
      data layout under ``base_path`` is read by :mod:`dmf_tpu.data`.
    * **Aliasing is dissolved**: the reference's dwi/dce/fusion sub-dicts
      are one mutable object (parameters_generate.py:174, 183); each is
      read independently into its own frozen :class:`ModelConfig`.
    * ``precision`` ``'16-mixed'`` (fp16 AMP) maps to ``'bf16-mixed'`` —
      the TPU-native mixed precision; fp16 AMP has no TPU counterpart.
    * Unknown keys are ignored, missing keys keep our defaults, and
      ``**overrides`` (Config field names) are applied last.
    """
    kw: Dict[str, Any] = {}
    for name in (
        "dim", "compile", "dataloader_num_workers", "debug_training",
        "debug_val", "backbone_debug", "full_debug", "debug_anomaly",
        "num_epochs", "batch_size", "segnum", "class_num",
        "control_metric", "early_stop_metric", "patience", "save_dir",
        "forced_mask_size", "test_mode", "mc_passes",
        "backbone_freeze_on_start", "backbone_num_groups", "unfreeze_timer",
        "foundation_model_unfreeze_timer", "backbone_unfreeze_lr",
        "backbone_unfreeze_wd", "foundation_model_unfreeze_lr",
        "backbone_unfreeze_lr_factor", "use_simple_aux_loss_scheduling",
        "dwi_add_adc_map", "base_path",
    ):
        _take(kw, d, name)
    for name in ("methods", "namelist", "dwi_bvals_to_use",
                 "dce_channels_to_use"):
        _take(kw, d, name, conv=tuple)
    _take(kw, d, "precision",
          conv=lambda p: "bf16-mixed" if str(p).endswith("-mixed") else p)

    for field_name, key in (("dwi_model", "dwi_model_parameters"),
                            ("dce_model", "dce_model_parameters"),
                            ("fusion_model", "fusion_model_parameters")):
        mp = d.get(key)
        if isinstance(mp, dict):
            kw[field_name] = _model_from_reference(mp)

    es = d.get("early_stopping_parameters")
    if isinstance(es, dict):
        ekw: Dict[str, Any] = {}
        for name in ("metric", "mode", "patience", "min_delta"):
            _take(ekw, es, name)
        kw["early_stopping"] = EarlyStoppingConfig(**ekw)

    kw.update(overrides)
    return Config(**kw)

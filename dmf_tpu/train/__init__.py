from .optim import (
    AdamWState,
    FusionOptController,
    GroupSpec,
    GroupedHyperParams,
    SingleModelOptController,
    adamw_init,
    adamw_update,
    build_group_spec,
    classify_param,
    clip_by_global_norm,
    discriminative_hparams,
    global_norm,
)
from .schedule import (
    CosineAnnealing,
    EarlyStopping,
    ReduceLROnPlateau,
    WarmupCosine,
    aux_loss_weight,
    make_scheduler,
)
from .state import TrainState
from .single import (
    compute_single_losses,
    make_single_eval_step,
    make_single_train_step,
)
from .fusion import (
    build_fusion_group_spec,
    compute_fusion_losses,
    make_fusion_eval_step,
    make_fusion_train_step,
)
from .loop import FitResult, fit_fusion, fit_single, init_single_state

__all__ = [
    "AdamWState",
    "FusionOptController",
    "GroupSpec",
    "GroupedHyperParams",
    "SingleModelOptController",
    "adamw_init",
    "adamw_update",
    "build_group_spec",
    "classify_param",
    "clip_by_global_norm",
    "discriminative_hparams",
    "global_norm",
    "CosineAnnealing",
    "EarlyStopping",
    "ReduceLROnPlateau",
    "WarmupCosine",
    "aux_loss_weight",
    "make_scheduler",
    "TrainState",
    "compute_single_losses",
    "make_single_eval_step",
    "make_single_train_step",
    "FitResult",
    "fit_fusion",
    "fit_single",
    "build_fusion_group_spec",
    "compute_fusion_losses",
    "make_fusion_eval_step",
    "make_fusion_train_step",
    "init_single_state",
]

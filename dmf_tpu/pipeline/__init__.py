from .paths import prepare_output_paths
from .prepare_single import (
    SingleModelData,
    build_single_model,
    export_processed_splits,
    load_processed_split,
    load_raw_tensors,
    prepare_single_data,
    save_processed_split,
)
from .run_single import run_single_model, test_single_model
from .run_fusion import (
    build_fusion_state,
    fusion_model_test,
    prepare_fusion_data,
    run_fusion_model,
    test_fusion_model,
)

__all__ = [
    "prepare_output_paths",
    "SingleModelData",
    "build_single_model",
    "export_processed_splits",
    "load_processed_split",
    "load_raw_tensors",
    "prepare_single_data",
    "save_processed_split",
    "run_single_model",
    "test_single_model",
    "build_fusion_state",
    "fusion_model_test",
    "prepare_fusion_data",
    "run_fusion_model",
    "test_fusion_model",
]

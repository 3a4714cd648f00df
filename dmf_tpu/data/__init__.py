from .splits import (
    data_segmentation,
    data_segmentation_mask,
    stratified_fold_indices,
    train_val_indices,
)
from .preprocess import (
    NyulStandardizer,
    append_adc,
    compute_adc_map,
    dce_global_max_normalize,
    dwi_normalize,
    nyul_transform,
    nyul_transform_fast,
    prep_dwi_adc_maps,
    preprocess_adc,
    zero_to_one_adc,
)
from .augment import augment_batch, eval_resize, random_affine_flip
from .pipeline import ArrayDataset, iterate_batches, prefetch_to_device
from .synthetic import make_synthetic_arrays

__all__ = [
    "data_segmentation",
    "data_segmentation_mask",
    "stratified_fold_indices",
    "train_val_indices",
    "NyulStandardizer",
    "append_adc",
    "compute_adc_map",
    "dce_global_max_normalize",
    "dwi_normalize",
    "nyul_transform",
    "nyul_transform_fast",
    "prep_dwi_adc_maps",
    "preprocess_adc",
    "zero_to_one_adc",
    "augment_batch",
    "eval_resize",
    "random_affine_flip",
    "ArrayDataset",
    "iterate_batches",
    "prefetch_to_device",
    "make_synthetic_arrays",
]

from .predict import make_fusion_predictor, make_single_predictor, tta_views
from .metrics import (
    MeanMetric,
    accuracy,
    classification_report,
    confusion_matrix,
    multiclass_auroc,
    multiclass_f1,
    multiclass_precision,
    multiclass_recall,
    per_class_accuracy,
)

__all__ = [
    "make_fusion_predictor",
    "make_single_predictor",
    "tta_views",
    "MeanMetric",
    "accuracy",
    "classification_report",
    "confusion_matrix",
    "multiclass_auroc",
    "multiclass_f1",
    "multiclass_precision",
    "multiclass_recall",
    "per_class_accuracy",
]

from .checkpoint import BestCheckpointer, restore_pytree, save_pytree
from .logging import MetricLogger, save_metrics_json

__all__ = [
    "BestCheckpointer",
    "restore_pytree",
    "save_pytree",
    "MetricLogger",
    "save_metrics_json",
]

from .resize import adaptive_avg_pool, global_avg_pool, resize_bilinear, resize_nearest

__all__ = [
    "adaptive_avg_pool",
    "global_avg_pool",
    "resize_bilinear",
    "resize_nearest",
]

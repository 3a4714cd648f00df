"""Mask visualization (train.py:945-989 equivalent).

Renders input / GT mask / predicted mask / binarized prediction to a PNG
(headless-safe; the reference pops a pyplot window every 10 epochs,
train.py:706-714)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def visualize_mask_triplet(
    input_img: np.ndarray,  # (H, W, C) or (H, W)
    gt_mask: Optional[np.ndarray],
    pred_mask: np.ndarray,  # logits (H, W) or (H, W, 1)
    out_path: str,
    title_prefix: str = "",
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def to2d(x):
        x = np.asarray(x)
        while x.ndim > 2:
            x = x[..., 0] if x.shape[-1] <= 4 else x[0]
        return x

    img = to2d(input_img if input_img.ndim == 2 else input_img[..., 0])
    pred = to2d(pred_mask)
    pred_bin = (1.0 / (1.0 + np.exp(-pred)) > 0.5).astype(np.float32)

    panels = [(img, f"{title_prefix}Input")]
    if gt_mask is not None:
        panels.append((to2d(gt_mask), "GT Mask"))
    panels += [(pred, "Pred Mask"), (pred_bin, "Pred Bin")]

    fig, axes = plt.subplots(1, len(panels), figsize=(2.6 * len(panels), 2.8))
    for ax, (data, title) in zip(np.atleast_1d(axes), panels):
        ax.imshow(data, cmap="gray")
        ax.set_title(title, fontsize=8)
        ax.axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path

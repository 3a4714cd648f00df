"""Pure-JAX spatial resize helpers (NHWC layout).

TPU-native replacements for the reference's ``F.interpolate`` calls
(e.g. model_module.py:82-88, train.py:450, prepare_single_model.py:359).

``resize_bilinear`` matches ``F.interpolate(mode='bilinear',
align_corners=False)`` (both use half-pixel sample centers).
``resize_nearest`` matches torch's ``mode='nearest'`` exactly
(``src = floor(dst * scale)``), which jax.image.resize's 'nearest' does not.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to spatial ``size``."""
    if x.ndim == 3:
        shape = (size[0], size[1], x.shape[-1])
    elif x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[-1])
    else:
        raise ValueError(f"expected 3D/4D NHWC input, got {x.shape}")
    if x.shape[-3] == size[0] and x.shape[-2] == size[1]:
        return x
    # antialias=False matches torch F.interpolate(mode='bilinear') on
    # downsampling as well as upsampling
    return jax.image.resize(x, shape, method="linear", antialias=False)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Torch-compatible nearest resize of NHWC (or HWC) images."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    rows = jnp.floor(jnp.arange(h_out) * (h_in / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w_in / w_out)).astype(jnp.int32)
    x = jnp.take(x, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x


def adaptive_avg_pool(x: jnp.ndarray, out_size: Sequence[int]) -> jnp.ndarray:
    """``AdaptiveAvgPool2d`` equivalent for NHWC inputs.

    Requires the input spatial dims to be divisible by ``out_size`` (true for
    every use in this model family: powers of two down to powers of two);
    falls back to torch-style variable-window pooling otherwise.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_size
    if (h_in, w_in) == (h_out, w_out):
        return x
    if h_in % h_out == 0 and w_in % w_out == 0:
        kh, kw = h_in // h_out, w_in // w_out
        lead = x.shape[:-3]
        x = x.reshape(*lead, h_out, kh, w_out, kw, x.shape[-1])
        return x.mean(axis=(-4, -2))
    # general case: torch adaptive pooling windows
    # start = floor(i*in/out), end = ceil((i+1)*in/out)
    def pool_axis(arr, axis, n_in, n_out):
        starts = (jnp.arange(n_out) * n_in) // n_out
        ends = -((-(jnp.arange(n_out) + 1) * n_in) // n_out)
        idx = jnp.arange(n_in)
        # (n_out, n_in) averaging matrix
        w = ((idx[None, :] >= starts[:, None]) & (idx[None, :] < ends[:, None]))
        w = w.astype(arr.dtype)
        w = w / w.sum(axis=1, keepdims=True)
        return jnp.tensordot(arr, w, axes=[[axis], [1]])

    # pool H then W; tensordot moves the contracted axis to the end
    out = pool_axis(x, -3, h_in, h_out)  # (..., W, C, H_out)
    out = jnp.moveaxis(out, -1, -3)
    out = pool_axis(out, -2, w_in, w_out)  # (..., H_out, C, W_out)
    out = jnp.moveaxis(out, -1, -2)
    return out


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over spatial dims of NHWC -> (..., C)."""
    return x.mean(axis=(-3, -2))

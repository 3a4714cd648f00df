"""Stateless, jittable data augmentation (NHWC), keyed by jax.random.

TPU-native replacement for the torchvision train pipeline
(prepare_single_model.py:107-114): RandomAffine(degrees=±90,
translate=(0.1,0.1), shear=(0.1,0.1)) + RandomHorizontalFlip +
RandomVerticalFlip + Resize(input_size).  The whole batch is transformed in
one vmapped XLA program instead of per-sample Python worker processes.

Randomness is *statistically* equivalent to the reference (SURVEY.md §7);
interpolation is nearest to match torchvision's RandomAffine default.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear


def _affine_inverse_matrix(angle_deg, translate_xy, shear_xy_deg, center):
    """Inverse affine (output->input) matching torchvision's parametrization:
    M = T * C * R(angle) * Shear * C^-1, applied about the image center."""
    a = angle_deg * math.pi / 180.0
    sx = shear_xy_deg[0] * math.pi / 180.0
    sy = shear_xy_deg[1] * math.pi / 180.0
    cx, cy = center
    tx, ty = translate_xy

    # torchvision forward matrix (x right, y down):
    # RSS = R(a) * Sh(sx, sy); here we build it then invert analytically.
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    # shear matrix [[1, -tan(sx)], [-tan(sy)... torchvision uses
    # [[cos(a - sy)/cos(sy), -cos(a - sy)*tan(sx)/cos(sy) - sin(a)], ...]
    # Simpler: compose explicitly.
    tan_sx, tan_sy = jnp.tan(sx), jnp.tan(sy)
    # rotation
    R = jnp.array([[cos_a, -sin_a], [sin_a, cos_a]])
    # shear (torchvision: x' = x + tan(sx)*y ; y' = tan(sy)*x + y applied as
    # inverse in its matrix construction; use the standard shear form)
    S = jnp.array([[1.0, tan_sx], [tan_sy, 1.0]])
    M = R @ S  # linear part, output = M @ input
    Minv = jnp.linalg.inv(M)
    # full inverse: input = Minv @ (output - center - translate) + center
    offset = jnp.array([cx + tx, cy + ty])
    return Minv, offset, jnp.array([cx, cy])


def affine_nearest(img: jnp.ndarray, angle_deg, translate_xy, shear_xy_deg) -> jnp.ndarray:
    """Apply an affine warp with nearest sampling and zero fill.

    ``img``: (H, W, C).
    """
    H, W = img.shape[0], img.shape[1]
    center = ((W - 1) * 0.5, (H - 1) * 0.5)
    Minv, offset, ctr = _affine_inverse_matrix(
        angle_deg, translate_xy, shear_xy_deg, center
    )
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    out_xy = jnp.stack([xs.ravel(), ys.ravel()], axis=0)  # (2, HW)
    src = Minv @ (out_xy - offset[:, None]) + ctr[:, None]
    sx = jnp.round(src[0]).astype(jnp.int32)
    sy = jnp.round(src[1]).astype(jnp.int32)
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    sxc = jnp.clip(sx, 0, W - 1)
    syc = jnp.clip(sy, 0, H - 1)
    gathered = img[syc, sxc]  # (HW, C)
    gathered = jnp.where(valid[:, None], gathered, 0.0)
    return gathered.reshape(H, W, img.shape[-1])


def random_affine_flip(
    key: jax.Array,
    img: jnp.ndarray,
    degrees: float = 90.0,
    translate: Tuple[float, float] = (0.1, 0.1),
    shear: Tuple[float, float] = (0.1, 0.1),
) -> jnp.ndarray:
    """RandomAffine + H/V flips for one (H, W, C) image."""
    H, W = img.shape[0], img.shape[1]
    k_ang, k_tx, k_ty, k_hf, k_vf = jax.random.split(key, 5)
    angle = jax.random.uniform(k_ang, (), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(k_tx, (), minval=-translate[0] * W, maxval=translate[0] * W)
    ty = jax.random.uniform(k_ty, (), minval=-translate[1] * H, maxval=translate[1] * H)
    # torchvision shear=(0.1, 0.1) is the (min, max) range for x-shear only
    shear_x = jnp.asarray((shear[0] + shear[1]) * 0.5)
    out = affine_nearest(img, angle, (tx, ty), (shear_x, jnp.asarray(0.0)))
    out = jnp.where(jax.random.bernoulli(k_hf), out[:, ::-1], out)
    out = jnp.where(jax.random.bernoulli(k_vf), out[::-1, :], out)
    return out


def augment_batch(
    key: jax.Array,
    imgs: jnp.ndarray,
    input_size: int,
    degrees: float = 90.0,
    translate: Tuple[float, float] = (0.1, 0.1),
    shear: Tuple[float, float] = (0.1, 0.1),
) -> jnp.ndarray:
    """Vmapped train-time augmentation over a batch, then resize.

    ``imgs``: (N, H, W, C) -> (N, input_size, input_size, C).
    """
    keys = jax.random.split(key, imgs.shape[0])
    out = jax.vmap(
        lambda k, im: random_affine_flip(k, im, degrees, translate, shear)
    )(keys, imgs)
    return resize_bilinear(out, (input_size, input_size))


def eval_resize(imgs: jnp.ndarray, input_size: int) -> jnp.ndarray:
    """Val/test pipeline: resize only (prepare_single_model.py:115-123)."""
    return resize_bilinear(imgs, (input_size, input_size))

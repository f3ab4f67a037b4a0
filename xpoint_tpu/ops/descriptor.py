"""Descriptor sampling at keypoint locations (bilinear + L2 norm).

Parity: reference interpolate_descriptors (utils/utils.py:229-238) —
normalized keypoint coords, grid_sample(align_corners=True) bilinear on the
coarse descriptor map, then L2-normalize. align_corners=True maps a full-res
(row, col) to coarse-grid position (row/H*(Hc-1), col/W*(Wc-1)).
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("image_shape",))
def interpolate_descriptors(keypoints, desc_map, image_shape):
    """Sample + L2-normalize descriptors at keypoint positions.

    Args:
        keypoints: (N, 2) float or int (row, col) in full-res pixel coords.
        desc_map: (Hc, Wc, D) coarse descriptor map.
        image_shape: static (H, W) of the full-res image.

    Returns:
        (N, D) unit-norm descriptors.
    """
    H, W = image_shape
    Hc, Wc, D = desc_map.shape
    kp = keypoints.astype(jnp.float32)
    # grid_sample align_corners=True coordinate mapping: row/H*(Hc-1)
    py = kp[:, 0] / H * (Hc - 1)
    px = kp[:, 1] / W * (Wc - 1)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[:, None]
    wx = (px - x0)[:, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hc - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Wc - 1)
    y1i = jnp.clip(y0i + 1, 0, Hc - 1)
    x1i = jnp.clip(x0i + 1, 0, Wc - 1)

    v00 = desc_map[y0i, x0i]
    v01 = desc_map[y0i, x1i]
    v10 = desc_map[y1i, x0i]
    v11 = desc_map[y1i, x1i]
    desc = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-12)

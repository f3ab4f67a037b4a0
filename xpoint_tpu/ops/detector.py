"""Detector-head post-processing: 65-channel cell logits -> full-res heatmap.

Parity: reference XPoint.detector_head eval path (XPoint.py:348-360):
softmax over the r^2+1 cell classes, drop the dustbin, PixelShuffle(r).
"""
from functools import partial

import jax
import jax.numpy as jnp

from .gridops import depth_to_space


@partial(jax.jit, static_argnames=("ratio",))
def prob_from_logits(logits, ratio=8):
    """(B, Hc, Wc, r^2+1) logits -> (B, H, W) probability heatmap."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    prob = prob[..., :-1]                       # drop dustbin
    return depth_to_space(prob, ratio)[..., 0]  # (B, H, W)


def _quadratic_peak_offset(pm, p0, pp):
    """1D quadratic peak interpolation: argmax of the parabola through
    (-1, pm), (0, p0), (1, pp), clamped to [-0.5, 0.5]; 0 when the
    curvature vanishes (flat neighborhood) or the center is not a local
    max along this axis (offset would exceed +-0.5 anyway)."""
    denom = pm - 2.0 * p0 + pp
    safe = jnp.abs(denom) > 1e-12
    off = 0.5 * (pm - pp) / jnp.where(safe, denom, 1.0)
    return jnp.clip(jnp.where(safe, off, 0.0), -0.5, 0.5)


def refine_keypoints_subpixel(prob, kps, valid):
    """Subpixel keypoint refinement: per-axis quadratic peak interpolation
    on the RAW heatmap (NMS zeroes neighbors, so refine pre-NMS values).

    This is an XPoint-TPU extension — the reference extracts integer
    keypoints only (np.argwhere, evaluation.py:281-282). Off by default
    (prediction config `subpixel: false`); when on, detector localization
    improves past the 1px grid, which feeds directly into repeatability,
    MMA and MAGSAC corner error. Classic SIFT/SuperPoint-style peak fit.

    Args:
        prob: (H, W) float heatmap (pre-NMS).
        kps: (K, 2) integer (row, col) keypoints, padded.
        valid: (K,) bool padding mask.

    Returns:
        (K, 2) float32 refined (row, col); padding rows pass through.
    """
    H, W = prob.shape
    r = kps[:, 0].astype(jnp.int32)
    c = kps[:, 1].astype(jnp.int32)

    def at(dr, dc):
        rr = jnp.clip(r + dr, 0, H - 1)
        cc = jnp.clip(c + dc, 0, W - 1)
        return prob[rr, cc].astype(jnp.float32)

    p0 = at(0, 0)
    dy = _quadratic_peak_offset(at(-1, 0), p0, at(1, 0))
    dx = _quadratic_peak_offset(at(0, -1), p0, at(0, 1))
    # at image borders the clipped neighbor duplicates the center, which
    # degenerates the parabola to a constant +-0.5 shift OUT of the image
    # — keep border keypoints on the integer grid along that axis
    dy = jnp.where((r > 0) & (r < H - 1), dy, 0.0)
    dx = jnp.where((c > 0) & (c < W - 1), dx, 0.0)
    out = kps.astype(jnp.float32) + jnp.stack([dy, dx], axis=-1)
    return jnp.where(valid[:, None], out, kps.astype(jnp.float32))

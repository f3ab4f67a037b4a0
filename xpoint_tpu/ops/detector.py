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

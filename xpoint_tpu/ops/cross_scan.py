"""Cross-scan / cross-merge: expand an (B, H, W, C) feature map into the
four directional 1-D scan orders of SS2D, and the inverse sum-merge.

TPU-native replacement for the Triton kernels in the reference
(vmamba_src/csm_triton.py:278-400); on TPU these are pure layout transforms
(transpose + flip) that XLA fuses into the surrounding computation
(SURVEY.md §2 native item 3).

Direction order (parity with csm_triton.py cross_scan_fwd, scans=0):
    0: row-major (H then W)
    1: column-major (W then H)
    2: row-major reversed
    3: column-major reversed
"""
from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def cross_scan(x):
    """(B, H, W, C) -> (B, 4, L, C) with the four scan orders."""
    B, H, W, C = x.shape
    row = x.reshape(B, H * W, C)
    col = x.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    return jnp.stack([row, col, jnp.flip(row, axis=1), jnp.flip(col, axis=1)],
                     axis=1)


@partial(jax.jit, static_argnames=("H", "W"))
def cross_merge(ys, H, W):
    """(B, 4, L, C) -> (B, H, W, C): invert each scan order and sum.

    Parity: csm_triton.py cross_merge_fwd (scans=0).
    """
    B, K, L, C = ys.shape
    fwd = ys[:, 0:2] + jnp.flip(ys[:, 2:4], axis=2)
    row = fwd[:, 0]                                            # (B, L, C)
    col = fwd[:, 1].reshape(B, W, H, C).transpose(0, 2, 1, 3).reshape(B, L, C)
    return (row + col).reshape(B, H, W, C)

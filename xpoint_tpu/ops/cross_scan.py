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


@partial(jax.jit, static_argnames=("scans",))
def cross_scan(x, scans=0):
    """(B, H, W, C) -> (B, 4, L, C).

    scans (parity with csm_triton.py cross_scan_fwd):
        0 cross2d: row-major, col-major, both reversed
        1 unidi:   row-major replicated 4x
        2 bidi:    row-major x2, row-major-reversed x2
    """
    B, H, W, C = x.shape
    row = x.reshape(B, H * W, C)
    if scans == 0:
        col = x.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        return jnp.stack([row, col, jnp.flip(row, axis=1),
                          jnp.flip(col, axis=1)], axis=1)
    if scans == 1:
        return jnp.stack([row, row, row, row], axis=1)
    if scans == 2:
        rev = jnp.flip(row, axis=1)
        return jnp.stack([row, row, rev, rev], axis=1)
    raise ValueError(f"unknown scan mode {scans}")


@partial(jax.jit, static_argnames=("H", "W", "scans"))
def cross_merge(ys, H, W, scans=0):
    """(B, 4, L, C) -> (B, H, W, C): invert each scan order and sum.

    Parity: csm_triton.py cross_merge_fwd.
    """
    B, K, L, C = ys.shape
    if scans == 0:
        fwd = ys[:, 0:2] + jnp.flip(ys[:, 2:4], axis=2)
        row = fwd[:, 0]                                        # (B, L, C)
        col = fwd[:, 1].reshape(B, W, H, C).transpose(0, 2, 1, 3) \
            .reshape(B, L, C)
        return (row + col).reshape(B, H, W, C)
    if scans == 1:
        return ys.sum(axis=1).reshape(B, H, W, C)
    if scans == 2:
        merged = ys[:, 0:2].sum(1) + jnp.flip(ys[:, 2:4].sum(1), axis=1)
        return merged.reshape(B, H, W, C)
    raise ValueError(f"unknown scan mode {scans}")

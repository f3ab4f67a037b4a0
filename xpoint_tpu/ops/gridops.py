"""space_to_depth / depth_to_space in NHWC layout.

Channel ordering matches the reference NCHW implementations
(utils/utils.py:134-146 and nn.PixelShuffle): for block size ``r`` the
depth channel index is ``i * r + j`` for spatial offset (i, j), so labels,
logits and the cell-softmax PixelShuffle all agree across frameworks.
"""
import jax.numpy as jnp


def space_to_depth(x, block_size):
    """(B, H, W) or (B, H, W, C) -> (B, H/r, W/r, r*r*C).

    For multi-channel inputs the output channel layout is (i, j, c) —
    identical to the reference permute (N, bs, bs, C, H', W') at
    utils/utils.py:141-146.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    B, H, W, C = x.shape
    r = block_size
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # (B, H', W', i, j, C)
    return x.reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x, block_size):
    """(B, H', W', r*r*C) -> (B, H, W, C); inverse of :func:`space_to_depth`.

    Matches nn.PixelShuffle / reference depth_to_space (utils.py:134-139):
    channel index i*r+j goes to spatial offset (i, j).
    """
    B, Hc, Wc, C = x.shape
    r = block_size
    c_out = C // (r * r)
    x = x.reshape(B, Hc, Wc, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # (B, H', i, W', j, C)
    x = x.reshape(B, Hc * r, Wc * r, c_out)
    return x

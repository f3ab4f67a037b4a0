"""SwinTransformerV2 encoder in flax.linen (NHWC).

Parity target: /root/reference/xpoint/models/SwinTransformerV2.py —
  * arbitrary input sizes: reflect-pad to a multiple of
    overall_downsample_ratio * window_size / 2 (check_image_size :708-717),
    crop the padding off at the end (forward :738-755),
  * SwinV2 blocks: post-norm residuals, cosine attention with clamped
    learned logit scale, continuous relative-position bias from a
    log-spaced coordinate table through a 2-layer MLP (WindowAttention
    :72-210), shifted windows with the standard SW-MSA mask,
  * PatchMerging with norm AFTER the 2x reduction (:348-400),
  * PatchEmbed conv stride downsample_ratio_beginning=4 (:484-527) and
    PatchUnEmbed depth_to_space(4) back to H/8 (:529-576); output channels
    embed_dim * 2^(n_stages-1) / 16.
"""
import math
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.gridops import depth_to_space
from .vssm import DropPath, _trunc_normal


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows, ws, H, W):
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _relative_coords_table(ws, pretrained_ws):
    """Log-spaced continuous rel-pos coordinate table (reference :124-136)."""
    h = np.arange(-(ws - 1), ws, dtype=np.float32)
    w = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), -1)[None]  # (1,2w-1,2w-1,2)
    denom = (pretrained_ws - 1) if pretrained_ws > 0 else (ws - 1)
    table = table / max(denom, 1)
    table *= 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.astype(np.float32)


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)


def _attn_mask(H, W, ws, shift):
    """SW-MSA mask (reference calculate_mask :267-288): (nW, N, N) 0/-100."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    m = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    pretrained_window_size: int = 0
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh

        logit_scale = self.param("logit_scale",
                                 lambda k, s: jnp.full(s, math.log(10.0)),
                                 (nh, 1, 1))
        qkv_w = self.param("qkv_kernel", _trunc_normal(), (C, 3 * C),
                           jnp.float32)
        qkv = jnp.dot(x, qkv_w.astype(x.dtype))
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(qkv.dtype)
        qkv = qkv.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention with clamped learned temperature
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn,
                          preferred_element_type=jnp.float32)
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(1.0 / 0.01)))
        attn = attn * scale

        # continuous relative position bias
        table = jnp.asarray(_relative_coords_table(
            self.window_size, self.pretrained_window_size))
        cpb = nn.Dense(512, name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(nh, use_bias=False, name="cpb_fc2")(cpb)
        cpb = cpb.reshape(-1, nh)
        idx = jnp.asarray(_relative_position_index(self.window_size).reshape(-1))
        bias = cpb[idx].reshape(N, N, nh).transpose(2, 0, 1)
        attn = attn + 16.0 * jax.nn.sigmoid(bias)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, name="proj", kernel_init=_trunc_normal())(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Sequence[int]
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    pretrained_window_size: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        H, W = self.input_resolution
        B, L, C = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(H, W) <= ws:
            ws, shift = min(H, W), 0

        shortcut = x
        xs = x.reshape(B, H, W, C)
        if shift > 0:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        windows = window_partition(xs, ws)
        mask = (jnp.asarray(_attn_mask(H, W, ws, shift))
                if shift > 0 else None)
        attn = WindowAttention(self.dim, ws, self.num_heads,
                               self.pretrained_window_size,
                               dtype=self.dtype, name="attn")(windows, mask)
        xs = window_reverse(attn, ws, H, W)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
        xs = xs.reshape(B, L, C)
        # SwinV2 post-norm residuals
        x = shortcut + DropPath(self.drop_path, deterministic)(
            nn.LayerNorm(dtype=jnp.float32, name="norm1")(xs).astype(x.dtype))

        y = nn.Dense(int(C * self.mlp_ratio), name="mlp_fc1",
                     kernel_init=_trunc_normal())(x)
        y = nn.gelu(y)
        y = nn.Dense(C, name="mlp_fc2", kernel_init=_trunc_normal())(y)
        x = x + DropPath(self.drop_path, deterministic)(
            nn.LayerNorm(dtype=jnp.float32, name="norm2")(y).astype(x.dtype))
        return x


class PatchMerging(nn.Module):
    dim: int
    input_resolution: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        xs = x.reshape(B, H, W, C)
        x0 = xs[:, 0::2, 0::2]
        x1 = xs[:, 1::2, 0::2]
        x2 = xs[:, 0::2, 1::2]
        x3 = xs[:, 1::2, 1::2]
        xs = jnp.concatenate([x0, x1, x2, x3], -1).reshape(B, -1, 4 * C)
        xs = nn.Dense(2 * C, use_bias=False, name="reduction",
                      kernel_init=_trunc_normal())(xs)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(xs).astype(x.dtype)


class SwinTransformerV2(nn.Module):
    """4-stage SwinV2 encoder; output (B, H/8, W/8, embed*2^(n-1)/16)."""
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)
    downsample_ratio_beginning: int = 4
    in_chans: int = 3
    dtype: Any = jnp.float32

    @property
    def overall_downsample_ratio(self):
        return 2 ** (len(self.depths) - 1) * self.downsample_ratio_beginning

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.in_chans == 3 and x.shape[-1] == 1:
            x = jnp.concatenate([x, x, x], axis=-1)
        x = x.astype(self.dtype)
        B, H_in, W_in, _ = x.shape

        # reflect-pad to a multiple of overall_ratio * window/2 (:708-717)
        rate = self.overall_downsample_ratio * self.window_size // 2
        pad_h = int(np.ceil(H_in / rate) * rate) - H_in
        pad_w = int(np.ceil(W_in / rate) * rate) - W_in
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        H, W = H_in + pad_h, W_in + pad_w

        r0 = self.downsample_ratio_beginning
        x = nn.Conv(self.embed_dim, (r0, r0), strides=(r0, r0),
                    padding="VALID", dtype=self.dtype, name="patch_embed")(x)
        Hp, Wp = H // r0, W // r0
        x = x.reshape(B, Hp * Wp, self.embed_dim)
        x = nn.LayerNorm(dtype=jnp.float32,
                         name="patch_embed_norm")(x).astype(self.dtype)

        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]
        block_idx = 0
        res = (Hp, Wp)
        for i_layer, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** i_layer)
            for d in range(depth):
                x = SwinBlock(dim, res, self.num_heads[i_layer],
                              self.window_size,
                              0 if d % 2 == 0 else self.window_size // 2,
                              self.mlp_ratio, dpr[block_idx],
                              self.pretrained_window_sizes[i_layer],
                              self.dtype,
                              name=f"layers_{i_layer}_blocks_{d}")(
                                  x, deterministic)
                block_idx += 1
            if i_layer < len(self.depths) - 1:
                x = PatchMerging(dim, res, self.dtype,
                                 name=f"layers_{i_layer}_downsample")(x)
                res = (res[0] // 2, res[1] // 2)

        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = x.reshape(B, res[0], res[1], -1)
        x = depth_to_space(x, 4)
        # crop padding off: target H_in // overall * 4 (:752-753)
        h = H_in // self.overall_downsample_ratio * 4
        w = W_in // self.overall_downsample_ratio * 4
        return x[:, :h, :w]


def build_swin_from_config(swin_cfg, dtype=jnp.float32):
    """Construct from the reference MODEL.SWINV2 yacs-style dict."""
    get = lambda k, d: swin_cfg.get(k, d)
    return SwinTransformerV2(
        embed_dim=int(get("EMBED_DIM", 96)),
        depths=tuple(get("DEPTHS", (2, 2, 6, 2))),
        num_heads=tuple(get("NUM_HEADS", (3, 6, 12, 24))),
        window_size=int(get("WINDOW_SIZE", 8)),
        mlp_ratio=float(get("MLP_RATIO", 4.0)),
        drop_path_rate=float(get("DROP_PATH_RATE", 0.2)),
        pretrained_window_sizes=tuple(get("PRETRAINED_WINDOW_SIZES",
                                          (0, 0, 0, 0))),
        dtype=dtype,
    )

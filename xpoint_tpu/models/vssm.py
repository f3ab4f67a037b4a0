"""VSSM (VMamba) visual state-space encoder in flax.linen, NHWC.

TPU-first re-design of the reference VMamba encoder
(/root/reference/xpoint/models/vmamba_src/VMamba.py):
  * channel-last everywhere (LayerNorm over the trailing dim is the native
    TPU layout; the reference's channel_first=False path maps 1:1),
  * the SS2D selective scan runs through ops/selective_scan (associative
    scan or Pallas chunked kernel) instead of the CUDA kernel,
  * cross-scan/merge are pure layout transforms fused by XLA.

Structure parity (for checkpoint conversion):
  patch_embed v2   VMamba.py:1406-1420  conv k3 s2 p1 -> LN -> GELU -> conv -> LN
  downsample v3    VMamba.py:1433-1440  conv k3 s2 p1 -> LN
  VSSBlock         VMamba.py:1153-1240  x + DropPath(SS2D(LN(x))); + MLP branch
  SS2D v05_noz     VMamba.py:380-664    in_proj -> dwconv3x3 -> SiLU ->
                                        cross-scan -> x/dt proj -> scan ->
                                        cross-merge -> LN -> out_proj
  mamba_init       VMamba.py:165-232    S4D-real A_log, D=1, softplus-inv dt bias
  VSSM.forward     VMamba.py:1507-1525  gray->3ch, stages, depth_to_space(4)

Production config (model_weights/XPoint-EXP1/params.yaml:108-130):
depths [2,2,2,2], embed 96, d_state 1, ssm_ratio 1.0, dt_rank auto(=6),
mlp_ratio 4, forward_type v05_noz, patchembed v2, downsample v3.
"""
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.cross_scan import cross_scan, cross_merge
from ..ops.selective_scan import selective_scan
from ..ops.gridops import depth_to_space


class _StridedConv3x3(nn.Module):
    """3x3 stride-2 pad-1 conv (patch embed v2 / downsample v3,
    VMamba.py:1410-1440) evaluated as a stride-1 2x2 conv over the
    space-to-depth'd input.

    XLA's native strided conv on thin channels runs ~10x off the HBM
    roofline on TPU (it can't tile a 3-channel stride-2 im2col onto the
    MXU); the s2d form quadruples the contraction width and runs ~2x
    faster. Parameters keep nn.Conv's exact name/shape ("kernel"
    (3,3,C,F), "bias" (F,)) so checkpoint conversion is unchanged — the
    kernel is scattered into the 16-tap layout at trace time.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, C, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if H % 2 or W % 2:
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(y.dtype)
        # tap (di, dj) of output pixel (i, j) reads input row 2i + di - 1:
        # di=0 -> s2d cell (i-1, parity 1); di=1 -> (i, 0); di=2 -> (i, 1)
        w2 = jnp.zeros((2, 2, 4 * C, self.features), k.dtype)
        for di in range(3):
            ci, pi = ((-1, 1) if di == 0 else (0, di - 1))
            for dj in range(3):
                cj, pj = ((-1, 1) if dj == 0 else (0, dj - 1))
                ch = (pi * 2 + pj) * C
                w2 = w2.at[ci + 1, cj + 1, ch:ch + C].set(k[di, dj])
        g = x.reshape(B, H // 2, 2, W // 2, 2, C)
        g = g.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        y = jax.lax.conv_general_dilated(
            g, w2, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


def _trunc_normal(std=0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference: timm DropPath)."""
    rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=_trunc_normal())(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     kernel_init=_trunc_normal())(x)
        return x


def _dt_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    """Softplus-inverse of log-uniform dt — mamba_init.dt_init (VMamba.py:167-191)."""
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(jax.random.uniform(key, shape, jnp.float32)
                     * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, min=dt_init_floor)
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)
    return init


def _a_log_init(key, shape, dtype=jnp.float32):
    """S4D-real A initialization — mamba_init.A_log_init (VMamba.py:194-204).
    shape: (K*D, N); A = 1..N per channel."""
    del key
    n = shape[-1]
    a = jnp.arange(1, n + 1, dtype=jnp.float32)
    return jnp.broadcast_to(jnp.log(a), shape).astype(dtype)


class SS2D(nn.Module):
    """2D selective scan block, forward-type v0/v2/v05 family semantics
    (scan modes cross2d/unidi/bidi = reference v05/v051d/v052d)."""
    d_model: int
    d_state: int = 1
    ssm_ratio: float = 1.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = False
    disable_z: bool = True          # _noz: no gate branch
    disable_z_act: bool = False     # _nozact: gate without SiLU
    out_act: bool = False           # _oact: GELU on the core output
    scan_mode: int = 0              # 0 cross2d | 1 unidi | 2 bidi
    dtype: Any = jnp.float32
    scan_backend: str = "assoc"

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        K = 4
        D = int(self.ssm_ratio * self.d_model)
        N = self.d_state
        R = int(math.ceil(self.d_model / 16)) if self.dt_rank == "auto" else self.dt_rank
        L = H * W

        d_proj = D if self.disable_z else 2 * D
        xz = nn.Dense(d_proj, use_bias=False, dtype=self.dtype,
                      kernel_init=_trunc_normal(), name="in_proj")(x)
        if self.disable_z:
            xs, z = xz, None
        else:
            xs, z = jnp.split(xz, 2, axis=-1)
            if not self.disable_z_act:
                z = nn.silu(z)

        if self.d_conv > 1:
            xs = nn.Conv(D, (self.d_conv, self.d_conv),
                         feature_group_count=D, use_bias=self.conv_bias,
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         name="conv2d")(xs)
        xs = nn.silu(xs)

        x_proj_w = self.param("x_proj_weight", _trunc_normal(),
                              (K, R + 2 * N, D), jnp.float32)
        dt_w = self.param("dt_projs_weight",
                          nn.initializers.uniform(scale=2 * R ** -0.5),
                          (K, D, R), jnp.float32)
        # uniform(scale) is [0, s); shift to [-s/2, s/2) = +-R^-0.5 like the ref
        dt_w_c = dt_w - R ** -0.5
        dt_bias = self.param("dt_projs_bias", _dt_bias_init(), (K, D), jnp.float32)
        A_logs = self.param("A_logs", _a_log_init, (K * D, N), jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (K * D,), jnp.float32)

        if self.scan_mode == -1:
            # cascade2d (v052dc, VMamba.py:525-600): rows scanned bi-
            # directionally with params [:2], parameter-free layernorm, then
            # columns with params [2:]
            def plain_ln(v):
                m = v.mean(-1, keepdims=True)
                var = ((v - m) ** 2).mean(-1, keepdims=True)
                return ((v - m) * jax.lax.rsqrt(var + 1e-5)).astype(v.dtype)

            def scan_axis(v, k0, along_w):
                # v: (B, H, W, D); scan along W (rows) or H (cols)
                seq = v if along_w else v.transpose(0, 2, 1, 3)
                Bb, S, Ln, _ = seq.shape           # (B, n_seq, L, D)
                seq = seq.reshape(Bb * S, Ln, D)
                xk2 = jnp.stack([seq, jnp.flip(seq, 1)], 1)  # (BS, 2, L, D)
                w2 = x_proj_w[k0:k0 + 2].astype(xk2.dtype)
                x_dbl = jnp.einsum("bkld,kcd->bklc", xk2, w2)
                dts, Bs2, Cs2 = jnp.split(x_dbl, [R, R + N], axis=-1)
                dts = jnp.einsum("bklr,kdr->bkld", dts,
                                 dt_w_c[k0:k0 + 2].astype(dts.dtype))
                u = xk2.transpose(0, 1, 3, 2).reshape(Bb * S, 2 * D, Ln)
                dtc = dts.transpose(0, 1, 3, 2).reshape(Bb * S, 2 * D, Ln)
                A2 = -jnp.exp(A_logs.reshape(K, D, N)[k0:k0 + 2].reshape(-1, N))
                ys = selective_scan(
                    u, dtc, A2, Bs2.transpose(0, 1, 3, 2),
                    Cs2.transpose(0, 1, 3, 2),
                    Ds.reshape(K, D)[k0:k0 + 2].reshape(-1),
                    dt_bias[k0:k0 + 2].reshape(-1), True,
                    backend=("assoc" if self.scan_backend == "pallas" and N > 1
                             else self.scan_backend))
                ys = ys.reshape(Bb * S, 2, D, Ln)
                # NOTE: the reference sums the two directions WITHOUT
                # un-reversing the flipped one (VMamba.py:588,599) — kept
                # verbatim for checkpoint parity
                merged = ys[:, 0] + ys[:, 1]                 # (BS, D, L)
                merged = merged.transpose(0, 2, 1).reshape(Bb, S, Ln, D)
                return merged if along_w else merged.transpose(0, 2, 1, 3)

            xs32 = plain_ln(xs.astype(jnp.float32)).astype(xs.dtype)
            y_row = scan_axis(xs32, 0, True).astype(jnp.float32)
            y_row = plain_ln(y_row).astype(xs.dtype)
            y = scan_axis(y_row, 2, False)
        elif (self.scan_mode == 0 and self.scan_backend == "pallas"
              and N == 1):
            # flip-free cross2d fast path: the dt/B/C projections are
            # token-wise, so they commute with the scan-order permutation —
            # compute them once per direction in BASE token order (row-major
            # j=0 / col-major j=1) and let the bidirectional kernel traverse
            # the reversed directions right-to-left. No flipped copies of
            # the (B, K, L, D) planes ever touch HBM, and the merge is a
            # plain sum (csm_triton.py cross_scan/cross_merge equivalent).
            from ..ops.selective_scan_pallas import (
                _bidir_plan, selective_scan_fused_bidir,
                selective_scan_fused_bidir_tok)
            if _bidir_plan(D)[1] > 1:
                # token-major layout: every operand is PRODUCED in the
                # kernel's (L, (b, j, d)) lane order by the einsums'
                # output orders, so the scan sees only free reshapes —
                # no standalone (B, K, L, D) <-> (L, M) transposes (the
                # 'data formatting' tail in the xprof breakdown).
                u_t = jnp.stack(
                    [xs.transpose(1, 2, 0, 3).reshape(L, B, D),
                     xs.transpose(2, 1, 0, 3).reshape(L, B, D)],
                    axis=2)                                   # (L, B, 2, D)
                w4 = x_proj_w.astype(u_t.dtype).reshape(2, 2, R + 2 * N, D)
                x_dbl = jnp.einsum("lbjd,rjcd->rlbjc", u_t, w4)
                dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
                dts = jnp.einsum(
                    "rlbjs,rjds->rlbjd", dts,
                    dt_w_c.astype(dts.dtype).reshape(2, 2, D, R))
                ys_f, ys_r = selective_scan_fused_bidir_tok(
                    u_t, dts, Bs[..., 0], Cs[..., 0],
                    -jnp.exp(A_logs.reshape(-1)), Ds, dt_bias.reshape(-1))
                ysum = ys_f + ys_r                            # (L, B, 2, D)
                y = (ysum[:, :, 0].reshape(H, W, B, D).transpose(2, 0, 1, 3)
                     + ysum[:, :, 1].reshape(W, H, B, D).transpose(2, 1, 0, 3))
            else:
                row = xs.reshape(B, L, D)
                col = xs.transpose(0, 2, 1, 3).reshape(B, L, D)
                xk2 = jnp.stack([row, col], axis=1)           # (B, 2, L, D)
                # direction k = 2r + j (r=reversed?, j=base order)
                w4 = x_proj_w.astype(xk2.dtype).reshape(2, 2, R + 2 * N, D)
                x_dbl = jnp.einsum("bjld,rjcd->brjlc", xk2, w4)
                x_dbl = x_dbl.reshape(B, K, L, R + 2 * N)
                dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
                dts = jnp.einsum("bklr,kdr->bkld", dts,
                                 dt_w_c.astype(dts.dtype))
                ys = selective_scan_fused_bidir(
                    xk2, dts, Bs, Cs, -jnp.exp(A_logs.reshape(-1)), Ds,
                    dt_bias.reshape(-1))                      # (B, 4, L, D)
                y_row = ys[:, 0] + ys[:, 2]
                y_col = ys[:, 1] + ys[:, 3]
                y = (y_row.reshape(B, H, W, D)
                     + y_col.reshape(B, W, H, D).transpose(0, 2, 1, 3))
        else:
            xk = cross_scan(xs, self.scan_mode)               # (B, K, L, D)
            x_dbl = jnp.einsum("bkld,kcd->bklc", xk, x_proj_w.astype(xk.dtype))
            dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
            dts = jnp.einsum("bklr,kdr->bkld", dts, dt_w_c.astype(dts.dtype))

            if self.scan_backend == "pallas" and N == 1:
                # fast path: kernel fed in the natural (B, K, L, D) layout
                from ..ops.selective_scan_pallas import selective_scan_fused_bkld
                ys = selective_scan_fused_bkld(
                    xk, dts, -jnp.exp(A_logs.reshape(-1)), Bs, Cs, Ds,
                    dt_bias.reshape(-1))
            else:
                # canonical scan layout (B, K*D, L)
                u = xk.transpose(0, 1, 3, 2).reshape(B, K * D, L)
                dt = dts.transpose(0, 1, 3, 2).reshape(B, K * D, L)
                Bmat = Bs.transpose(0, 1, 3, 2)                    # (B, K, N, L)
                Cmat = Cs.transpose(0, 1, 3, 2)
                ys = selective_scan(u, dt, -jnp.exp(A_logs), Bmat, Cmat, Ds,
                                    dt_bias.reshape(-1), True,
                                    backend=self.scan_backend)
                ys = ys.reshape(B, K, D, L).transpose(0, 1, 3, 2)  # (B, K, L, D)
            y = cross_merge(ys, H, W, self.scan_mode)              # (B, H, W, D)

        y = nn.LayerNorm(dtype=jnp.float32, name="out_norm")(y)
        y = y.astype(x.dtype)
        if self.out_act:
            y = nn.gelu(y)
        if z is not None:
            y = y * z
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        kernel_init=_trunc_normal(), name="out_proj")(y)


def _one_by_one_scan(x, H, W):
    """cross_scan one_by_one=True (csm_triton.py): (B, H, W, 4*N) where
    direction k OWNS channels [kN:(k+1)N], each laid out in its own scan
    order -> (B, 4, L, N)."""
    B = x.shape[0]
    N = x.shape[-1] // 4
    row = lambda v: v.reshape(B, H * W, N)
    col = lambda v: v.transpose(0, 2, 1, 3).reshape(B, H * W, N)
    parts = [x[..., k * N:(k + 1) * N] for k in range(4)]
    return jnp.stack([row(parts[0]), col(parts[1]),
                      jnp.flip(row(parts[2]), 1),
                      jnp.flip(col(parts[3]), 1)], axis=1)


def _dt_w_init(rank, scale=1.0):
    """mamba_init.dt_init 'random': uniform(-R^-0.5*scale, R^-0.5*scale)."""
    std = rank ** -0.5 * scale
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)
    return init


class SS2Dv3(nn.Module):
    """xv forward types (reference SS2Dv3.forwardxv, VMamba.py:716-911):
    the in_proj emits u, dt, AND the per-direction B/C planes directly
    (no x_proj), with optional input/output depthwise convs.

    NOTE: the upstream forwardxv is non-executable as written — the dts
    relayout at VMamba.py:874 views to (B, L, -1) where conv1d and the
    scan need (B, C, L). This module implements the evident intended
    semantics (view (B, -1, L)); the parity test repairs the torch oracle
    the same way (tests/test_torch_converter.py).

    modes: xv1a (dt from a shared rank-R projection), xv2a (dt emitted at
    full d_inner, no projection), xv3a (per-direction rank-R projections).
    postfixes: _mul (gate by u), _act (GELU), _ca/_ca1 (SiLU/GELU conv
    act), _ocov/_ocov2/_cpos (conv placement), _onnone/_ondwconv3/_oncnorm/
    _onsoftmax/_onsigmoid (out-norm variants, VMamba.py:666-705).
    """
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    forward_type: str = "xv1a"
    dtype: Any = jnp.float32
    scan_backend: str = "assoc"

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        D = int(self.ssm_ratio * self.d_model)
        N = self.d_state
        R = int(math.ceil(self.d_model / 16)) if self.dt_rank == "auto" \
            else self.dt_rank
        L = H * W

        ftype = self.forward_type
        strip = lambda tag, v: (v.endswith(tag), v[:-len(tag)] if v.endswith(tag) else v)
        onnone, ftype = strip("_onnone", ftype)
        ondw, ftype = strip("_ondwconv3", ftype)
        oncn, ftype = strip("_oncnorm", ftype)
        onsm, ftype = strip("_onsoftmax", ftype)
        onsg, ftype = strip("_onsigmoid", ftype)
        omul, ftype = strip("_mul", ftype)
        oact, ftype = strip("_act", ftype)
        mode = ftype[:4]
        assert mode in ("xv1a", "xv2a", "xv3a"), self.forward_type
        rest = ftype[4:]
        ca, rest = strip("_ca", rest)
        ca1, rest = strip("_ca1", rest)
        ocov2, rest = strip("_ocov2", rest)
        ocov, rest = strip("_ocov", rest)
        cpos, rest = strip("_cpos", rest)
        iconv = self.d_conv > 1 and not (ocov or ocov2)
        cact = nn.gelu if ca1 else (nn.silu if ca else (lambda v: v))

        dts_dim = {"xv1a": R, "xv2a": D, "xv3a": 4 * R}[mode]
        d_all = D + dts_dim + 8 * N

        dw = lambda feats, name: nn.Conv(
            feats, (self.d_conv, self.d_conv), feature_group_count=feats,
            use_bias=self.conv_bias, padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name=name)

        if iconv and self.d_conv > 1:
            x = cact(dw(self.d_model, "conv2d")(x))
        elif cpos and self.d_conv > 1:
            x = x + dw(self.d_model, "conv2d")(x)
        x = nn.Dense(d_all, use_bias=False, dtype=self.dtype,
                     kernel_init=_trunc_normal(), name="in_proj")(x)
        if ocov2 and self.d_conv > 1:
            x = dw(d_all, "conv2d")(x)

        us = x[..., :D]
        dts = x[..., D:D + dts_dim]
        BsF = x[..., D + dts_dim:D + dts_dim + 4 * N]
        CsF = x[..., D + dts_dim + 4 * N:]
        _us = us

        us4 = cross_scan(us, 0)                             # (B, 4, L, D)
        Bs4 = _one_by_one_scan(BsF, H, W)                   # (B, 4, L, N)
        Cs4 = _one_by_one_scan(CsF, H, W)
        if mode == "xv3a":
            dts4 = _one_by_one_scan(dts, H, W)              # (B, 4, L, R)
        else:
            dts4 = cross_scan(dts, 0)                       # (B, 4, L, R|D)

        A_logs = self.param("A_logs", _a_log_init, (4 * D, N), jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (4 * D,), jnp.float32)
        dt_bias = self.param("dt_projs_bias", _dt_bias_init(), (4, D),
                             jnp.float32)
        if mode != "xv2a":
            dt_w = self.param("dt_projs_weight", _dt_w_init(R), (4, D, R),
                              jnp.float32)
            dts4 = jnp.einsum("bklr,kdr->bkld", dts4, dt_w.astype(dts4.dtype))

        u = us4.transpose(0, 1, 3, 2).reshape(B, 4 * D, L)
        dt = dts4.transpose(0, 1, 3, 2).reshape(B, 4 * D, L)
        ys = selective_scan(u, dt, -jnp.exp(A_logs),
                            Bs4.transpose(0, 1, 3, 2),
                            Cs4.transpose(0, 1, 3, 2), Ds,
                            dt_bias.reshape(-1), True,
                            backend=("assoc" if self.scan_backend == "pallas"
                                     and N > 1 else self.scan_backend))
        ys = ys.reshape(B, 4, D, L).transpose(0, 1, 3, 2)
        y = cross_merge(ys, H, W, 0)                        # (B, H, W, D)

        if onnone:
            pass
        elif oncn:
            y = nn.LayerNorm(dtype=jnp.float32, name="out_norm")(y)
            y = nn.Conv(D, (3, 3), feature_group_count=D, use_bias=False,
                        padding=[(1, 1), (1, 1)], dtype=jnp.float32,
                        name="out_norm_conv")(y)
        elif ondw:
            y = nn.Conv(D, (3, 3), feature_group_count=D, use_bias=False,
                        padding=[(1, 1), (1, 1)], dtype=jnp.float32,
                        name="out_norm_conv")(y)
        elif onsm:
            # SoftmaxSpatial over L (VMamba.py:152-161, dim=1 channel-last)
            y = jax.nn.softmax(y.reshape(B, L, D), axis=1).reshape(
                B, H, W, D)
        elif onsg:
            y = jax.nn.sigmoid(y)
        else:
            y = nn.LayerNorm(dtype=jnp.float32, name="out_norm")(y)
        y = y.astype(x.dtype)
        if oact:
            y = nn.gelu(y)
        if omul:
            y = y * _us
        if ocov and self.d_conv > 1:
            y = y + cact(dw(D, "oconv2d")(_us))
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        kernel_init=_trunc_normal(), name="out_proj")(y)


class SS2Dm0(nn.Module):
    """Mamba-2 (SSD) variant of SS2D — reference SS2Dm0 (VMamba.py:915-1104):
    KR scalar-A heads of dim d_inner//R, chunked SSD scan, GELU activation,
    v2 initialization (A = -1, Ds ones, small random dt bias)."""
    d_model: int
    d_state: int = 64
    ssm_ratio: float = 2.0
    dt_rank: Any = "auto"
    d_conv: int = 3
    conv_bias: bool = True
    disable_z: bool = False
    disable_z_act: bool = False
    out_act: bool = False
    scan_mode: int = 0
    chunk_size: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.ssd import ssd_chunked
        B, H, W, _ = x.shape
        K = 4
        d_inner = int(self.ssm_ratio * self.d_model)
        R = int(math.ceil(self.d_model / 16)) if self.dt_rank == "auto" \
            else self.dt_rank
        Dh = d_inner // R            # head dim
        N = self.d_state
        L = H * W

        d_proj = d_inner if self.disable_z else 2 * d_inner
        xz = nn.Dense(d_proj, use_bias=False, dtype=self.dtype,
                      kernel_init=_trunc_normal(), name="in_proj")(x)
        if self.disable_z:
            xs, z = xz, None
        else:
            xs, z = jnp.split(xz, 2, axis=-1)
            if not self.disable_z_act:
                z = nn.gelu(z)
        if self.d_conv > 1:
            xs = nn.Conv(d_inner, (self.d_conv, self.d_conv),
                         feature_group_count=d_inner, use_bias=self.conv_bias,
                         padding=[(1, 1), (1, 1)], dtype=self.dtype,
                         name="conv2d")(xs)
        xs = nn.gelu(xs)

        xk = cross_scan(xs, self.scan_mode)                  # (B, K, L, RD)

        x_proj_w = self.param("x_proj_weight", _trunc_normal(),
                              (K, R + 2 * N, d_inner), jnp.float32)
        # v2 init (VMamba.py:1007-1011): A=-exp(0)=-1, Ds ones, dt bias rand
        A_logs = self.param("A_logs", nn.initializers.zeros, (K, R),
                            jnp.float32)
        Ds = self.param("Ds", nn.initializers.ones, (K, R, Dh), jnp.float32)
        dt_bias = self.param("dt_projs_bias",
                             nn.initializers.uniform(scale=0.1), (K, R),
                             jnp.float32)

        x_dbl = jnp.einsum("bkld,kcd->bklc", xk, x_proj_w.astype(xk.dtype))
        dts, Bsp, Csp = jnp.split(x_dbl, [R, R + N], axis=-1)

        # heads: (B, L, K*R, Dh); groups: K (B/C shared across R heads)
        xh = xk.transpose(0, 2, 1, 3).reshape(B, L, K * R, Dh)
        dth = dts.transpose(0, 2, 1, 3).reshape(B, L, K * R)
        Bg = Bsp.transpose(0, 2, 1, 3)                       # (B, L, K, N)
        Cg = Csp.transpose(0, 2, 1, 3)

        y, _ = ssd_chunked(xh, dth, -jnp.exp(A_logs.reshape(-1)), Bg, Cg,
                           Ds.reshape(K * R, Dh), dt_bias.reshape(-1),
                           chunk_size=self.chunk_size)
        ys = y.reshape(B, L, K, R * Dh).transpose(0, 2, 1, 3)  # (B,K,L,RD)
        out = cross_merge(ys.astype(x.dtype), H, W, self.scan_mode)

        out = nn.LayerNorm(dtype=jnp.float32, name="out_norm")(out)
        out = out.astype(x.dtype)
        if self.out_act:
            out = nn.gelu(out)
        if z is not None:
            out = out * z
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        kernel_init=_trunc_normal(), name="out_proj")(out)


class VSSBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    d_state: int = 1
    ssm_ratio: float = 1.0
    dt_rank: Any = "auto"
    ssm_conv: int = 3
    ssm_conv_bias: bool = False
    mlp_ratio: float = 4.0
    disable_z: bool = True
    disable_z_act: bool = False
    out_act: bool = False
    scan_mode: int = 0
    use_m0: bool = False
    dtype: Any = jnp.float32
    scan_backend: str = "assoc"
    xv_type: str = ""          # non-empty: SS2Dv3 forward type (xv1a/2a/3a)

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        if self.xv_type:
            y = SS2Dv3(self.dim, self.d_state, self.ssm_ratio, self.dt_rank,
                       self.ssm_conv, self.ssm_conv_bias, self.xv_type,
                       self.dtype, self.scan_backend, name="op")(y)
        elif self.use_m0:
            y = SS2Dm0(self.dim, self.d_state, self.ssm_ratio, self.dt_rank,
                       self.ssm_conv, self.ssm_conv_bias, self.disable_z,
                       self.disable_z_act, self.out_act, self.scan_mode,
                       dtype=self.dtype, name="op")(y)
        else:
            y = SS2D(self.dim, self.d_state, self.ssm_ratio, self.dt_rank,
                     self.ssm_conv, self.ssm_conv_bias, self.disable_z,
                     self.disable_z_act, self.out_act, self.scan_mode,
                     self.dtype, self.scan_backend, name="op")(y)
        x = x + DropPath(self.drop_path, deterministic)(y)
        if self.mlp_ratio > 0:
            y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(x.dtype)
            y = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                    self.dtype, name="mlp")(y)
            x = x + DropPath(self.drop_path, deterministic)(y)
        return x


class VSSM(nn.Module):
    """4-stage VMamba encoder; output (B, H/8, W/8, embed_dim/2)."""
    depths: Sequence[int] = (2, 2, 2, 2)
    embed_dim: int = 96
    d_state: int = 1
    ssm_ratio: float = 1.0
    dt_rank: Any = "auto"
    ssm_conv: int = 3
    ssm_conv_bias: bool = False
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    disable_z: bool = True
    disable_z_act: bool = False
    out_act: bool = False
    scan_mode: int = 0
    use_m0: bool = False
    patch_size: int = 4
    in_chans: int = 3
    dtype: Any = jnp.float32
    scan_backend: str = "assoc"
    xv_type: str = ""

    @nn.compact
    def __call__(self, x, deterministic=True):
        # grayscale -> 3 channels by replication (VMamba.py:1509-1510)
        if self.in_chans == 3 and x.shape[-1] == 1:
            x = jnp.concatenate([x, x, x], axis=-1)
        x = x.astype(self.dtype)

        import numpy as np
        dims = [int(self.embed_dim * 2 ** i) for i in range(len(self.depths))]
        dpr = [float(v) for v in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]

        # patch embed v2: two stride-2 convs with explicit torch-style
        # padding, both in s2d form (profiled: the plain thin-channel
        # stride-2 conv1 runs ~11x off the HBM roofline; s2d's relayout of
        # the small input is far cheaper than what the conv form wastes)
        x = _StridedConv3x3(self.embed_dim // 2, dtype=self.dtype,
                            name="patch_embed_conv1")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_embed_norm1")(x).astype(self.dtype)
        x = nn.gelu(x)
        x = _StridedConv3x3(self.embed_dim, dtype=self.dtype,
                            name="patch_embed_conv2")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_embed_norm2")(x).astype(self.dtype)

        block_idx = 0
        for i_layer, depth in enumerate(self.depths):
            for d in range(depth):
                x = VSSBlock(dims[i_layer], dpr[block_idx], self.d_state,
                             self.ssm_ratio, self.dt_rank, self.ssm_conv,
                             self.ssm_conv_bias, self.mlp_ratio,
                             self.disable_z, self.disable_z_act,
                             self.out_act, self.scan_mode, self.use_m0,
                             self.dtype, self.scan_backend, self.xv_type,
                             name=f"layers_{i_layer}_blocks_{d}")(x, deterministic)
                block_idx += 1
            if i_layer < len(self.depths) - 1:
                # downsample v3
                x = _StridedConv3x3(dims[i_layer + 1], dtype=self.dtype,
                                    name=f"layers_{i_layer}_downsample_conv")(x)
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"layers_{i_layer}_downsample_norm")(x).astype(self.dtype)

        # final depth_to_space(4): H/32 x W/32 x 8E -> H/8 x W/8 x E/2
        return depth_to_space(x, 4)


def build_vssm_from_config(vssm_cfg, dtype=jnp.float32, scan_backend="assoc"):
    """Construct a VSSM from the reference MODEL.VSSM yacs-style dict
    (params.yaml model_parameters; MYCONFIG.py:74-97)."""
    get = lambda k, d: vssm_cfg.get(k, d)
    dt_rank = get("SSM_DT_RANK", "auto")
    # parse the forward_type postfix tags like the reference checkpostfix
    # chain (VMamba.py:420-444): _noz/_nozact/_oact + scan-mode variants
    ftype = str(get("SSM_FORWARDTYPE", "v05_noz"))
    disable_z = ftype.endswith("_noz") or "_noz_" in ftype
    disable_z_act = "_nozact" in ftype
    out_act = "_oact" in ftype
    base = ftype.split("_")[0]
    scan_mode = {"v051d": 1, "v052d": 2, "v052dc": -1}.get(base, 0)
    use_m0 = base.startswith("m")
    xv_type = ftype if base.startswith("xv") else ""
    if use_m0:
        # m0 keeps the gate unless _noz; reference defaults d_state=64
        pass
    return VSSM(
        depths=tuple(get("DEPTHS", [2, 2, 2, 2])),
        embed_dim=int(get("EMBED_DIM", 96)),
        d_state=int(get("SSM_D_STATE", 1)),
        ssm_ratio=float(get("SSM_RATIO", 1.0)),
        dt_rank=dt_rank if dt_rank == "auto" else int(dt_rank),
        ssm_conv=int(get("SSM_CONV", 3)),
        ssm_conv_bias=bool(get("SSM_CONV_BIAS", False)),
        mlp_ratio=float(get("MLP_RATIO", 4.0)),
        drop_path_rate=float(get("DROP_PATH_RATE", 0.2)),
        disable_z=disable_z,
        disable_z_act=disable_z_act,
        out_act=out_act,
        scan_mode=scan_mode,
        use_m0=use_m0,
        dtype=dtype,
        scan_backend=scan_backend,
        xv_type=xv_type,
    )

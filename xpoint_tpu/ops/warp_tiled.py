"""Tiled two-pass affine warp: the TPU-native hot path for homographic
adaptation's warp->forward->unwarp loop.

Why: XLA lowers the flat bilinear gather of ops/warp.py (jnp.take along the
minor axis) to a scalar-core loop on TPU — measured ~1000x off the HBM
roofline (~13 ms per 512^2 warp). This module replaces the gather with
arithmetic the VPU/MXU are built for: per output tile, the projective map
is linearized to an affine map (least-squares over the tile corners), and
the warp is evaluated as TWO hat-weight contractions (the classic
Catmull-Smith two-pass resampler) whose interpolation weights are BUILT
FROM IOTAS — no data-dependent memory addressing beyond one dynamic_slice
of the source window per tile.

Pass structure for the inverse map  src = proj(Hinv @ dst)  (per tile):
  pass 1 (contract src rows p): tmp[t, u] = sum_p hat(ys(t, u) - p) win[p, u]
      where ys at fixed source COLUMN u along destination row t is EXACT:
      a projective map sends the dst line y=t to a straight source line,
      so ys is linear in the source x (= u) with per-row slope/intercept
      computed from the row's two endpoint images — no affine
      approximation of the homography is needed anywhere;
  pass 2 (contract src cols u): out[t, x] = sum_u hat(xs(t, x) - u) tmp[t, u]
      with xs(t, x) evaluated exactly from the projective map.
Both passes are dense dot_generals over a (win, win) source window.

Accuracy: two-pass differs from single-pass bilinear by the classic
shear-interpolation term, equivalent position error <= ~0.25*|dys/dxd| px.
Near-+-90-degree rotations (max_angle: pi IS sampled, selfsup config)
break the x-first decomposition (|dxs/dxd| -> 0, the Catmull-Smith
"bottleneck"); those homographies instead warp the 90-degree-PRE-ROTATED
source with the rotation composed into the map, which restores
|dxs/dxd| ~ 1. The per-homography choice runs under lax.cond inside a
lax.scan over homographies, so only one branch executes per warp.

Reference hot loop being replaced: homographies.py:100-158 (kornia
homography_warp per sampled warp) driven by export_keypoints.py:162-256.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _box(x):
    return (jnp.abs(x) <= 0.5).astype(jnp.float32)


def _align_down(x, m):
    return (x // m) * m


def _align_canvas8(src):
    """Reflect-pad the last-two-but-channel dims (bottom/right) so the
    padded canvas is a multiple of 8 — required for exact bottom-edge DMA
    window coverage in the Pallas path (see _warp_one_pallas). The added
    rows sit at/beyond the two-fold reflection coverage limit, where reads
    are already clamp-approximate by contract."""
    ey = -src.shape[-3] % 8
    ex = -src.shape[-2] % 8
    if not (ey or ex):
        return src
    padw = [(0, 0)] * (src.ndim - 3) + [(0, ey), (0, ex), (0, 0)]
    return jnp.pad(src, padw, mode="reflect")


def _tile_params(shape_cm, Hinv, ny, nx, tile, pad, win, win_y_al, win_x_al):
    """Vectorized per-tile parameters for the Pallas two-pass warp.

    DMA windows must be tile-aligned in HBM (sublane starts/extents x8,
    lane x128), so the kernel fetches an ALIGNED (win_y_al, win_x_al)
    window and rolls lanes by the true x-offset. Returns, per tile:
    wy_al/wx_al (nt,) aligned window origins (padded-canvas frame),
    xoff (nt,) the lane roll, A/m (nt, T, 1) pass-1 row intercept/slope
    with y relative to the ALIGNED origin and x relative to the TRUE
    origin (ys(t, u) = A + m*u), and xs_w (nt, T, T) pass-2 positions
    relative to the true origin."""
    C, Hp, Wp = shape_cm
    T = tile
    nt = ny * nx
    ti = jnp.arange(nt)
    oy = (ti // nx * T).astype(jnp.float32)[:, None]        # (nt, 1)
    ox = (ti % nx * T).astype(jnp.float32)[:, None]
    t_i = jnp.arange(T, dtype=jnp.float32)[None, :]         # (1, T)

    def src_xy(xd, yd):
        den = Hinv[2, 0] * xd + Hinv[2, 1] * yd + Hinv[2, 2]
        return ((Hinv[0, 0] * xd + Hinv[0, 1] * yd + Hinv[0, 2]) / den,
                (Hinv[1, 0] * xd + Hinv[1, 1] * yd + Hinv[1, 2]) / den)

    xs0, ys0 = src_xy(ox, oy + t_i)                          # (nt, T)
    xs1, ys1 = src_xy(ox + (T - 1), oy + t_i)
    dxs = xs1 - xs0
    safe = jnp.where(jnp.abs(dxs) < 1e-6,
                     jnp.where(dxs < 0, -1e-6, 1e-6), dxs)
    m = (ys1 - ys0) / safe

    cx0 = (xs0 + xs1).mean(axis=1) / 2                       # (nt,)
    cy0 = (ys0 + ys1).mean(axis=1) / 2
    wy_true = jnp.clip(jnp.floor(cy0 - win / 2).astype(jnp.int32) + pad,
                       0, Hp - win)
    wx_true = jnp.clip(jnp.floor(cx0 - win / 2).astype(jnp.int32) + pad,
                       0, Wp - win)
    wy_al = _align_down(jnp.clip(wy_true, 0, Hp - win_y_al), 8)
    wx_al = _align_down(jnp.clip(wx_true, 0, Wp - win_x_al), 128)
    xoff = jnp.clip(wx_true - wx_al, 0, win_x_al - win)
    # ship the aligned origins as BLOCK indices (x8 / x128 recovered in
    # kernel) so Mosaic can prove the DMA slice offsets are tile-aligned
    wy_al_blocks = wy_al // 8
    wx_al_blocks = wx_al // 128

    # positions must be relative to the EFFECTIVE rolled origin
    # (wx_al + xoff): near canvas edges the xoff clip shifts the window,
    # and positions computed from wx_true would desynchronize from it
    ox_w = ((wx_al + xoff).astype(jnp.float32) - pad)[:, None]
    oy_w = (wy_al.astype(jnp.float32) - pad)[:, None]
    A = (ys0 - oy_w) + m * (ox_w - xs0)

    x_i = jnp.arange(T, dtype=jnp.float32)[None, None, :]
    xs_full, _ = src_xy(ox[:, :, None] + x_i, (oy + t_i)[:, :, None])
    xs_w = xs_full - ox_w[:, :, None]                        # (nt, T, T)
    return wy_al_blocks, wx_al_blocks, xoff, A[:, :, None], m[:, :, None], xs_w


def _warp_pallas_kernel(wy_ref, wx_ref, xo_ref, A_ref, m_ref, xs_ref,
                        src_ref, out_ref, wscr, sem, *, tile, win,
                        win_y_al, win_x_al, nx, C, bilinear):
    """One output tile: DMA its ALIGNED source window HBM->VMEM, roll
    lanes to the true x-origin, build the hat/box weights FROM IOTAS in
    VMEM (the XLA version materializes them through HBM — measured as its
    bottleneck), run the two pass-reductions, write the tile."""
    T = tile
    ti = pl.program_id(0) * nx + pl.program_id(1)
    dma = pltpu.make_async_copy(
        src_ref.at[:, pl.ds(wy_ref[ti] * 8, win_y_al),
                   pl.ds(wx_ref[ti] * 128, win_x_al)],
        wscr, sem)
    dma.start()
    A = A_ref[0]                                             # (T, 1)
    m = m_ref[0]
    xs = xs_ref[0]                                           # (T, T)
    P = win_y_al
    u_i = jax.lax.broadcasted_iota(jnp.int32, (T, win), 1
                                   ).astype(jnp.float32)
    ys = A + m * u_i                                         # (T, U)
    p_i = jax.lax.broadcasted_iota(jnp.int32, (T, P, win), 1
                                   ).astype(jnp.float32)

    def kern(x):
        if bilinear:
            return jnp.maximum(0.0, 1.0 - jnp.abs(x))
        return (jnp.abs(x) <= 0.5).astype(jnp.float32)

    w1 = kern(ys[:, None, :] - p_i)                          # (T, P, U)
    u_i3 = jax.lax.broadcasted_iota(jnp.int32, (T, T, win), 2
                                    ).astype(jnp.float32)
    w2 = kern(xs[:, :, None] - u_i3)                         # (T, T, U)
    dma.wait()
    xoff = xo_ref[ti]
    for c in range(C):
        band = wscr[c].astype(jnp.float32)                   # (P, win_x_al)
        # positive-shift roll (dynamic negative shifts are unreliable):
        # element xoff lands at lane 0
        src_c = pltpu.roll(band, win_x_al - xoff, axis=1)[:, :win]
        tmp = jnp.sum(w1 * src_c[None, :, :], axis=1)        # (T, U)
        out_ref[0, 0, c] = jnp.sum(w2 * tmp[:, None, :], axis=2
                                   ).astype(out_ref.dtype)


def _warp_one_pallas(img_pad, Hinv, ny, nx, tile, pad, mode, win):
    """Pallas TPU path of _warp_one: identical math, weights never touch
    HBM. Grid = output tiles; per-tile window origins ride scalar
    prefetch so the kernel can DMA data-dependent source windows."""
    Hp, Wp, C = img_pad.shape
    T = tile
    # +8 y headroom is EXACT given Hp % 8 == 0 (callers round the padded
    # canvas up): at the bottom edge the clip moves the origin up by <= 8
    # and align-down then contributes 0; elsewhere align-down <= 7 < 8.
    # (The x analog ships a bigger window and rolls lanes — see xoff.)
    win_y_al = win + 8
    win_x_al = 256 if win + 128 <= 256 else 384
    src_cm = jnp.transpose(img_pad, (2, 0, 1))               # (C, Hp, Wp)
    wy, wx, xo, A, m, xs_w = _tile_params(
        src_cm.shape, Hinv, ny, nx, tile, pad, win, win_y_al, win_x_al)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec((1, T, 1), lambda ty, tx, *_: (ty * nx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda ty, tx, *_: (ty * nx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, T), lambda ty, tx, *_: (ty * nx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, C, T, T),
                               lambda ty, tx, *_: (ty, tx, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, win_y_al, win_x_al), img_pad.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    out_cm = pl.pallas_call(
        partial(_warp_pallas_kernel, tile=T, win=win, win_y_al=win_y_al,
                win_x_al=win_x_al, nx=nx, C=C,
                bilinear=(mode == "bilinear")),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ny, nx, C, T, T), img_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(wy, wx, xo, A, m, xs_w, src_cm)
    # (ny, nx, C, T, T) -> (H, W, C)
    return out_cm.transpose(0, 3, 1, 4, 2).reshape(ny * T, nx * T, C)


def _warp_one(img_pad, Hinv, ny, nx, tile, pad, mode, win=None):
    """Warp a reflect/zero-PREPADDED (Hp, Wp, C) source by one homography
    (Hinv maps UNPADDED dst pixel -> UNPADDED src pixel). Output tiling is
    (ny, nx) tiles of `tile`; returns (ny*tile, nx*tile, C).

    win: source window side. Must cover the worst source span of a T-tile
    (T*scale*(|cos|+|sin|) + hat support); beyond it, weights vanish and
    the pixel reads 0. The caller picks 2T+16 (scale <= ~1.6, the common
    case) or 4T+16 (up to ~2.8, seen near patch corners at perspective
    0.15) from the homography's local scale.
    """
    Hp, Wp, C = img_pad.shape
    T = tile
    if win is None:
        win = 4 * T + 16
    wxa = 256 if win + 128 <= 256 else 384
    if (jax.default_backend() == "tpu" and Hp >= win + 8 and Wp >= wxa):
        return _warp_one_pallas(img_pad, Hinv, ny, nx, tile, pad, mode, win)
    kern = _hat if mode == "bilinear" else _box

    def src_xy(xd, yd):
        den = Hinv[2, 0] * xd + Hinv[2, 1] * yd + Hinv[2, 2]
        xs = (Hinv[0, 0] * xd + Hinv[0, 1] * yd + Hinv[0, 2]) / den
        ys = (Hinv[1, 0] * xd + Hinv[1, 1] * yd + Hinv[1, 2]) / den
        return xs, ys

    def one_tile(carry, idx):
        ty = idx // nx
        tx = idx % nx
        oy = (ty * T).astype(jnp.float32)
        ox = (tx * T).astype(jnp.float32)
        t_i = jnp.arange(T, dtype=jnp.float32)        # dst row within tile
        x_i = jnp.arange(T, dtype=jnp.float32)        # dst col within tile

        # exact source images of each dst row's endpoints: the projective
        # image of the line y = oy+t is a straight source line, so ys is
        # linear in xs along it — per-row slope/intercept from 2 points
        xs0, ys0 = src_xy(ox, oy + t_i)                       # (T,)
        xs1, ys1 = src_xy(ox + (T - 1), oy + t_i)
        dxs = xs1 - xs0
        safe = jnp.where(jnp.abs(dxs) < 1e-6,
                         jnp.where(dxs < 0, -1e-6, 1e-6), dxs)
        m_t = (ys1 - ys0) / safe                              # dys/dxs per row

        # source window: centered on the tile's source bounding box
        cx0 = (xs0 + xs1).mean() / 2
        cy0 = (ys0 + ys1).mean() / 2
        wy0 = jnp.clip(jnp.floor(cy0 - win / 2).astype(jnp.int32) + pad,
                       0, Hp - win)
        wx0 = jnp.clip(jnp.floor(cx0 - win / 2).astype(jnp.int32) + pad,
                       0, Wp - win)
        winv = jax.lax.dynamic_slice(img_pad, (wy0, wx0, 0), (win, win, C))
        # window-frame coordinates (unpadded-source minus window origin)
        ox_w = wx0.astype(jnp.float32) - pad
        oy_w = wy0.astype(jnp.float32) - pad

        u_i = jnp.arange(win, dtype=jnp.float32)      # src col within win
        p_i = jnp.arange(win, dtype=jnp.float32)      # src row within win

        # pass 1 (contract src rows): ys along dst row t at src column u
        ys = (ys0 - oy_w)[:, None] + m_t[:, None] * (
            u_i[None, :] + ox_w - xs0[:, None])               # (T, win)
        # HIGHEST precision: at DEFAULT these contractions run on the MXU
        # with bf16-truncated hat weights (TPU), shifting sampled values by
        # up to ~6e-3 vs the Pallas kernel's f32 VPU reduce (same issue as
        # the elementwise Q @ Hinv compose below)
        w1 = kern(ys[:, None, :] - p_i[None, :, None])        # (T, p, u)
        tmp = jnp.einsum("tpu,puc->tuc", w1, winv,
                         precision=jax.lax.Precision.HIGHEST)  # (T, win, C)

        # pass 2 (contract src cols): exact xs per dst pixel
        xs, _ = src_xy(ox + x_i[None, :], oy + t_i[:, None])   # (T, T)
        w2 = kern(xs[:, :, None] - ox_w - u_i[None, None, :])  # (T, T, win)
        out_t = jnp.einsum("txu,tuc->txc", w2, tmp,
                          precision=jax.lax.Precision.HIGHEST)  # (T, T, C)
        return carry, out_t

    # unroll: the per-iteration while-loop overhead (~16 us: buffer swaps,
    # dynamic_slice/update setup) dominates the ~3 us of tile compute
    _, tiles = jax.lax.scan(one_tile, 0, jnp.arange(ny * nx), unroll=8)
    tiles = tiles.reshape(ny, nx, T, T, C)
    return tiles.transpose(0, 2, 1, 3, 4).reshape(ny * T, nx * T, C)


@partial(jax.jit, static_argnames=("mode", "padding_mode", "tile"))
def warp_image_multi_tiled(images, homographies, mode="bilinear",
                           padding_mode="zeros", tile=32):
    """Drop-in fast path for ops.warp.warp_image_multi (same contract:
    images (B, H, W, C), homographies (n, 3, 3) -> (n, B, H, W, C)) built
    on the tiled two-pass affine resampler. H and W must be multiples of
    `tile`.

    Padding semantics are baked in by pre-padding the source once:
    'zeros' pads by 4*tile+16 (beyond which the window clamp reads zeros —
    exact); 'reflection' = BORDER_REFLECT_101 padded by a full image size
    per side (multi-fold, like grid_sample), covering source excursions up
    to min(H, W) px outside the image — beyond that the content clamps to
    the outermost fold (the reference keeps reflecting; HA's valid masks
    zero those regions' contributions anyway).
    """
    B, H, W, C = images.shape
    assert H % tile == 0 and W % tile == 0, (H, W, tile)
    if padding_mode == "reflection":
        # the infinite REFLECT_101 extension is mirror-symmetric about every
        # fold point, so padding twice by (size-1) reproduces it out to two
        # folds (+-2(min(H,W)-1) px — beyond any sampled homography)
        p1 = min(H, W) - 1
        pad = 2 * p1
        flat = images.transpose(1, 2, 0, 3).reshape(H, W, B * C)
        src = jnp.pad(flat, ((p1, p1), (p1, p1), (0, 0)), mode="reflect")
        src = jnp.pad(src, ((p1, p1), (p1, p1), (0, 0)), mode="reflect")
    else:
        pad = 4 * tile + 16
        flat = images.transpose(1, 2, 0, 3).reshape(H, W, B * C)
        src = jnp.pad(flat, ((pad, pad), (pad, pad), (0, 0)))
    # 90-deg-CCW-rotated source for the bottleneck branch: src(x, y) =
    # src_rot(x_r, y_r) with (x_r, y_r) = Q(x, y) = (y, W-1-x)
    src_rot = jnp.rot90(src, 1, axes=(0, 1))
    # round each canvas up to a multiple of 8 with bottom/right reflect
    # rows AFTER rotating (an asymmetric pre-rotation pad would shift the
    # rotated content's origin): the Pallas path aligns DMA window origins
    # DOWN to 8, and at the bottom canvas edge the align-down remainder
    # eats into the (win + 8) y headroom unless Hp % 8 == 0 (reflection's
    # 5H-4 ≡ 4 mod 8 silently lost up to 7 source rows on the worst tile).
    src = _align_canvas8(src)
    src_rot = _align_canvas8(src_rot)
    Q = jnp.asarray([[0.0, 1.0, 0.0],
                     [-1.0, 0.0, W - 1.0],
                     [0.0, 0.0, 1.0]])
    Hinvs = jnp.linalg.inv(homographies.astype(jnp.float32))

    ny, nx = H // tile, W // tile

    def body(carry, Hinv):
        out = _warp_one_oriented(src, src_rot, Q, Hinv, H, W, ny, nx,
                                 tile, pad, mode)
        return carry, out

    _, out = jax.lax.scan(body, 0, Hinvs)   # (n, H, W, B*C)
    return out.reshape(-1, H, W, B, C).transpose(0, 3, 1, 2, 4)


def _warp_one_oriented(src, src_rot, Q, Hinv, H, W, ny, nx, tile, pad, mode):
    """One homography with the bottleneck-avoiding orientation choice:
    x-first two-pass degenerates when |dxs/dxd| -> 0 (rotation near +-90
    deg); compose with the source pre-rotation instead, which turns
    dxs_r/dxd into dys/dxd (the dominant derivative there). Also picks the
    source-window size from the local scale (small window = ~3x fewer
    contraction FLOPs for the common scale <= ~1.6 case); only ONE of the
    four branches executes per homography (lax.cond under lax.scan).
    """
    def jac(px, py):
        den = Hinv[2, 0] * px + Hinv[2, 1] * py + Hinv[2, 2]
        sx = (Hinv[0, 0] * px + Hinv[0, 1] * py + Hinv[0, 2]) / den
        sy = (Hinv[1, 0] * px + Hinv[1, 1] * py + Hinv[1, 2]) / den
        return jnp.stack([
            jnp.stack([(Hinv[0, 0] - Hinv[2, 0] * sx) / den,
                       (Hinv[0, 1] - Hinv[2, 1] * sx) / den]),
            jnp.stack([(Hinv[1, 0] - Hinv[2, 0] * sy) / den,
                       (Hinv[1, 1] - Hinv[2, 1] * sy) / den])])

    cxm = (W - 1) / 2.0
    cym = (H - 1) / 2.0
    j = jac(cxm, cym)
    rotate = jnp.abs(j[0, 0]) < jnp.abs(j[1, 0])
    # conservative local-scale bound: max abs Jacobian row sum (L_inf
    # operator norm) probed at the center and the four corners (perspective
    # makes the scale strongly position-dependent), x1.15 margin
    probes = jnp.stack([jac(px, py) for px, py in
                        [(cxm, cym), (0.0, 0.0), (W - 1.0, 0.0),
                         (0.0, H - 1.0), (W - 1.0, H - 1.0)]])
    scale = jnp.max(jnp.abs(probes).sum(axis=-1)) * 1.15
    small = scale * tile + 18.0 <= 2 * tile + 16

    def run(s, Hm, w):
        return _warp_one(s, Hm, ny, nx, tile, pad, mode, win=w)

    # compose Q @ Hinv ELEMENTWISE: on TPU a plain fp32 matmul may run on
    # the MXU in bf16 (xla_allow_excess_precision), truncating homography
    # entries enough to shift sample positions by ~0.1 px
    QH = jnp.stack([Hinv[1], Q[1, 2] * Hinv[2] - Hinv[0], Hinv[2]])
    return jax.lax.cond(
        rotate,
        lambda: jax.lax.cond(
            small,
            lambda: run(src_rot, QH, 2 * tile + 16),
            lambda: run(src_rot, QH, 4 * tile + 16)),
        lambda: jax.lax.cond(
            small,
            lambda: run(src, Hinv, 2 * tile + 16),
            lambda: run(src, Hinv, 4 * tile + 16)))


@partial(jax.jit, static_argnames=("mode", "padding_mode", "tile"))
def warp_image_batch_tiled(images, homographies, mode="bilinear",
                           padding_mode="zeros", tile=32):
    """Tiled fast path for ops.warp.warp_image_batch (per-sample
    homographies): images (n, H, W, C), homographies (n, 3, 3) ->
    (n, H, W, C). Same accuracy contract as warp_image_multi_tiled."""
    n, H, W, C = images.shape
    assert H % tile == 0 and W % tile == 0, (H, W, tile)
    if padding_mode == "reflection":
        p1 = min(H, W) - 1
        pad = 2 * p1
        src = jnp.pad(images, ((0, 0), (p1, p1), (p1, p1), (0, 0)),
                      mode="reflect")
        src = jnp.pad(src, ((0, 0), (p1, p1), (p1, p1), (0, 0)),
                      mode="reflect")
    else:
        pad = 4 * tile + 16
        src = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    src_rot = jnp.rot90(src, 1, axes=(1, 2))
    # canvases rounded to x8 AFTER rotation for exact bottom-edge DMA
    # alignment (see warp_image_multi_tiled)
    src = _align_canvas8(src)
    src_rot = _align_canvas8(src_rot)
    Q = jnp.asarray([[0.0, 1.0, 0.0],
                     [-1.0, 0.0, W - 1.0],
                     [0.0, 0.0, 1.0]])
    Hinvs = jnp.linalg.inv(homographies.astype(jnp.float32))
    ny, nx = H // tile, W // tile

    def body(carry, inp):
        s, s_r, Hinv = inp
        out = _warp_one_oriented(s, s_r, Q, Hinv, H, W, ny, nx,
                                 tile, pad, mode)
        return carry, out

    _, out = jax.lax.scan(body, 0, (src, src_rot, Hinvs))
    return out

"""Pallas TPU kernel for the first-order linear recurrence at the heart of
the selective scan:  h_t = a_t * h_{t-1} + b_t.

This is the TPU replacement for the reference CUDA kernel's cub BlockScan
(cusoflex/selective_scan_fwd_kernel_oflex.cuh, combine op
selective_scan_common.h:92-97) and its chunked prefix-callback structure
(n_chunks, selective_scan.h:29):

  * grid = (M-blocks, L-chunks); the L dimension iterates sequentially with
    the fp32 state carried in VMEM scratch between chunks (the analog of the
    CUDA running-prefix callback),
  * within a chunk, a Hillis-Steele log-depth scan over the (a, b) pairs —
    numerically equivalent to the sequential recurrence (only pairwise
    products are formed, no global cumprod underflow),
  * lanes = M (batch x channels x state), sublanes = time.

Everything around the recurrence (delta softplus, exp(delta*A), delta*B*u,
y = <C, h> + D*u) stays in jnp where XLA fuses it into the surrounding
program; autodiff flows through a custom VJP that runs the SAME kernel in
reverse (the analog of reverse_scan.cuh).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_CHUNK = 256
DEFAULT_LANE_BLOCK = 512


def _scan_kernel(a_ref, b_ref, h_ref, carry, *, chunk):
    """One (T, MB) chunk: inclusive scan + carry update."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)

    # Hillis-Steele inclusive scan over the time (sublane) axis:
    # combine((A1,B1) prev, (A2,B2) cur) = (A1*A2, A2*B1 + B2)
    offset = 1
    while offset < chunk:
        a_prev = jnp.concatenate(
            [jnp.ones_like(a[:offset]), a[:-offset]], axis=0)
        b_prev = jnp.concatenate(
            [jnp.zeros_like(b[:offset]), b[:-offset]], axis=0)
        b = a * b_prev + b
        a = a * a_prev
        offset *= 2

    h0 = carry[0:1, :]                  # (1, MB) state entering the chunk
    h = b + a * h0
    h_ref[...] = h
    carry[0:1, :] = h[chunk - 1:chunk, :]


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("chunk", "lane_block"))
def _scan_lm(a, b, chunk=DEFAULT_CHUNK, lane_block=DEFAULT_LANE_BLOCK):
    """Inclusive linear-recurrence scan over axis 0 of (L, M) arrays."""
    L, M = a.shape
    Lp = _round_up(max(L, chunk), chunk)
    Mp = _round_up(max(M, lane_block), lane_block)
    # pad: a=1/b=0 keeps the recurrence inert in padded time steps
    a_p = jnp.pad(a, ((0, Lp - L), (0, Mp - M)), constant_values=1.0)
    b_p = jnp.pad(b, ((0, Lp - L), (0, Mp - M)), constant_values=0.0)

    grid = (Mp // lane_block, Lp // chunk)
    h = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, lane_block), lambda m, l: (l, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, lane_block), lambda m, l: (l, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, lane_block), lambda m, l: (l, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lp, Mp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, lane_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(a_p, b_p)
    return h[:L, :M]


@jax.custom_vjp
def linear_scan(a, b):
    """h_t = a_t * h_{t-1} + b_t (h_0 = 0), scanned over axis 0 of (L, M)."""
    return _scan_lm(a, b)


def _linear_scan_fwd(a, b):
    h = _scan_lm(a, b)
    return h, (a, h)


def _linear_scan_bwd(res, g):
    a, h = res
    # dh_t = g_t + a_{t+1} dh_{t+1}: reverse scan with shifted coefficients
    a_next = jnp.concatenate([a[1:], jnp.ones_like(a[:1])], axis=0)
    dh = jnp.flip(_scan_lm(jnp.flip(a_next, 0), jnp.flip(g, 0)), 0)
    h_prev = jnp.concatenate([jnp.zeros_like(h[:1]), h[:-1]], axis=0)
    return dh * h_prev, dh


linear_scan.defvjp(_linear_scan_fwd, _linear_scan_bwd)


def _fused_scan_kernel(dt_ref, u_ref, b_ref, c_ref, A_ref, D_ref, bias_ref,
                       y_ref, carry, *, chunk):
    """Fully fused N=1 selective scan: softplus + discretization + scan +
    output projection in one VMEM pass (the analog of the CUDA kernel's
    single fused traversal). 5 HBM passes instead of ~12."""
    li = pl.program_id(1)

    @pl.when(li == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    dt = jax.nn.softplus(dt_ref[...].astype(jnp.float32)
                         + bias_ref[...].astype(jnp.float32))
    u = u_ref[...].astype(jnp.float32)
    a = jnp.exp(dt * A_ref[...].astype(jnp.float32))
    b = dt * u * b_ref[...].astype(jnp.float32)

    offset = 1
    while offset < chunk:
        a_prev = jnp.concatenate(
            [jnp.ones_like(a[:offset]), a[:-offset]], axis=0)
        b_prev = jnp.concatenate(
            [jnp.zeros_like(b[:offset]), b[:-offset]], axis=0)
        b = a * b_prev + b
        a = a * a_prev
        offset *= 2

    h = b + a * carry[0:1, :]
    y_ref[...] = (c_ref[...].astype(jnp.float32) * h
                  + D_ref[...].astype(jnp.float32) * u).astype(y_ref.dtype)
    carry[0:1, :] = h[chunk - 1:chunk, :]


@functools.partial(jax.jit, static_argnames=("chunk", "lane_block"))
def _fused_scan_lm(dt, u, bc, cc, A, D, bias, chunk=DEFAULT_CHUNK,
                   lane_block=DEFAULT_LANE_BLOCK):
    """(L, M) fused scan. A/D/bias: (1, M) per-lane constants."""
    L, M = dt.shape
    Lp = _round_up(max(L, chunk), chunk)
    Mp = _round_up(max(M, lane_block), lane_block)

    def pad(x, cv=0.0):
        return jnp.pad(x, ((0, Lp - x.shape[0]), (0, Mp - M)),
                       constant_values=cv)

    dt_p, u_p, bc_p, cc_p = pad(dt), pad(u), pad(bc), pad(cc)
    # A padded with -1 keeps exp(dt*A) <= 1 in dead lanes (no overflow)
    A_p = jnp.pad(A, ((0, 0), (0, Mp - M)), constant_values=-1.0)
    D_p = jnp.pad(D, ((0, 0), (0, Mp - M)))
    bias_p = jnp.pad(bias, ((0, 0), (0, Mp - M)))

    grid = (Mp // lane_block, Lp // chunk)
    row_spec = pl.BlockSpec((chunk, lane_block), lambda m, l: (l, m),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, lane_block), lambda m, l: (0, m),
                              memory_space=pltpu.VMEM)
    # oflex semantics: output in the input dtype (bf16 under mixed precision
    # halves the write traffic; the fp32 state stays in VMEM)
    out_dtype = dt.dtype
    y = pl.pallas_call(
        functools.partial(_fused_scan_kernel, chunk=chunk),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec,
                  const_spec, const_spec, const_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((Lp, Mp), out_dtype),
        scratch_shapes=[pltpu.VMEM((8, lane_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(dt_p, u_p, bc_p, cc_p, A_p, D_p, bias_p)
    return y[:L, :M]


def _selective_scan_fused_impl(u, delta, A, Bmat, Cmat, D, delta_bias):
    """N=1 fast path in reference layout; fp32 output."""
    Batch, K, N, L = Bmat.shape
    KC = u.shape[1]
    Cdim = KC // K
    M = Batch * KC

    # (B, KC, L) -> (L, B*KC)
    to_lm = lambda x: x.reshape(Batch * KC, L).T
    u_lm = to_lm(u)
    dt_lm = to_lm(delta)
    # (B, K, 1, L) -> broadcast over Cdim -> (L, B*KC)
    bc = jnp.repeat(Bmat[:, :, 0, :], Cdim, axis=1).reshape(M, L).T
    cc = jnp.repeat(Cmat[:, :, 0, :], Cdim, axis=1).reshape(M, L).T
    A_m = jnp.tile(A[:, 0], Batch)[None]
    D_m = (jnp.tile(D, Batch) if D is not None
           else jnp.zeros((KC * Batch,), jnp.float32))[None]
    bias_m = (jnp.tile(delta_bias, Batch) if delta_bias is not None
              else jnp.zeros((KC * Batch,), jnp.float32))[None]

    y = _fused_scan_lm(dt_lm, u_lm, bc, cc,
                       A_m.astype(jnp.float32), D_m.astype(jnp.float32),
                       bias_m.astype(jnp.float32))
    return y.T.reshape(Batch, KC, L)


def _fused_bkld_impl(u, dt, A, Bs, Cs, D, delta_bias):
    B, K, L, Dim = u.shape
    M = B * K * Dim
    to_lm = lambda x: x.transpose(2, 0, 1, 3).reshape(L, M)
    bc = jnp.broadcast_to(Bs, (B, K, L, Dim))
    cc = jnp.broadcast_to(Cs, (B, K, L, Dim))
    A_m = jnp.tile(A, B)[None].astype(jnp.float32)
    D_m = jnp.tile(D, B)[None].astype(jnp.float32)
    bias_m = jnp.tile(delta_bias, B)[None].astype(jnp.float32)
    y = _fused_scan_lm(to_lm(dt), to_lm(u), to_lm(bc), to_lm(cc),
                       A_m, D_m, bias_m)
    return y.reshape(L, B, K, Dim).transpose(1, 2, 0, 3)


def _unfused_bkld_ref(u, dt, A, Bs, Cs, D, delta_bias):
    """jnp reference of the bkld fused scan (linear_scan handles the
    recurrence vjp) — used for the backward pass."""
    B, K, L, Dim = u.shape
    dtp = jax.nn.softplus(dt.astype(jnp.float32)
                          + delta_bias.reshape(1, K, 1, Dim))
    uf = u.astype(jnp.float32)
    a = jnp.exp(dtp * A.reshape(1, K, 1, Dim))
    b = dtp * uf * Bs.astype(jnp.float32)
    M = B * K * Dim
    to_lm = lambda x: x.transpose(2, 0, 1, 3).reshape(L, M)
    h = linear_scan(to_lm(a), to_lm(b))
    h = h.reshape(L, B, K, Dim).transpose(1, 2, 0, 3)
    return Cs.astype(jnp.float32) * h + D.reshape(1, K, 1, Dim) * uf


@jax.custom_vjp
def selective_scan_fused_bkld(u, dt, A, Bs, Cs, D, delta_bias):
    """N=1 fused scan taking SS2D's natural layout directly — one relayout
    to (L, M) instead of the two big transposes of the reference layout.

    u/dt: (B, K, L, Dim); Bs/Cs: (B, K, L, 1); A/D/delta_bias: (K*Dim,)
    with A/D/delta_bias reshaped per (K, Dim). Returns (B, K, L, Dim) fp32.
    """
    return _fused_bkld_impl(u, dt, A, Bs, Cs, D, delta_bias)


def _fused_bkld_fwd(*args):
    return _fused_bkld_impl(*args), args


def _fused_bkld_bwd(res, g):
    # the fused forward emits the input dtype (oflex); the unfused reference
    # computes in fp32 — align the cotangent dtype before pulling back
    _, vjp = jax.vjp(_unfused_bkld_ref, *res)
    return vjp(g.astype(jnp.float32))


selective_scan_fused_bkld.defvjp(_fused_bkld_fwd, _fused_bkld_bwd)


def _hs_prefix(a, b, chunk):
    """Hillis-Steele PREFIX composition: after the loop, (a_t, b_t) compose
    [0, t] so h_t = b_t + a_t * h_entry_left."""
    offset = 1
    while offset < chunk:
        a_prev = jnp.concatenate(
            [jnp.ones_like(a[:offset]), a[:-offset]], axis=0)
        b_prev = jnp.concatenate(
            [jnp.zeros_like(b[:offset]), b[:-offset]], axis=0)
        b = a * b_prev + b
        a = a * a_prev
        offset *= 2
    return a, b


def _hs_suffix(a, b, chunk):
    """Hillis-Steele SUFFIX composition: (a_t, b_t) compose [t, chunk) so
    h_t = b_t + a_t * h_entry_right."""
    offset = 1
    while offset < chunk:
        a_next = jnp.concatenate(
            [a[offset:], jnp.ones_like(a[:offset])], axis=0)
        b_next = jnp.concatenate(
            [b[offset:], jnp.zeros_like(b[:offset])], axis=0)
        b = b + a * b_next
        a = a * a_next
        offset *= 2
    return a, b


def _fused_bidir_kernel(dt_f_ref, u_f_ref, bc_f_ref, cc_f_ref,
                        dt_r_ref, u_r_ref, bc_r_ref, cc_r_ref,
                        A_f_ref, D_f_ref, bias_f_ref,
                        A_r_ref, D_r_ref, bias_r_ref,
                        y_f_ref, y_r_ref, *rest, chunk, reps, emit_ckpt=False):
    """Forward + reversed selective scans in one pass, flip-free.

    The reversed directions of SS2D's cross-scan are the SAME sequences
    traversed right-to-left. Instead of materializing flipped copies in HBM
    (the jnp.flip the reference's Triton cross-scan kernel exists to avoid,
    csm_triton.py:278-400), the rev lanes read the mirrored L-chunk
    (index map n-1-l) and run a suffix Hillis-Steele
    (h_t = a_t*h_{t+1} + b_t), writing results back at original positions.

    The N=1 B/C scalars are constant across the channel (lane-minor) axis:
    with lane blocks aligned to whole (batch, direction) groups they arrive
    COMPACT — one column per group — and are expanded in VMEM (`reps` = the
    channel count each column covers), cutting the kernel's HBM input
    volume nearly in half versus pre-broadcast (L, M) planes.

    With emit_ckpt, the per-chunk ENTRY states are also written out
    ((n_chunks, M) per direction, the residuals the fused backward kernel
    rebuilds h from — the analog of the CUDA backward's chunked
    recomputation, selective_scan_bwd_kernel_oflex.cuh).
    """
    if emit_ckpt:
        hck_f_ref, hck_r_ref, carry_f, carry_r = rest
    else:
        carry_f, carry_r = rest
    li = pl.program_id(1)

    def lanes(ref, width):
        blk = ref[...].astype(jnp.float32)
        if reps == 1:
            return blk
        # compact block carries ALL groups (full compact width — tiny);
        # select + lane-repeat this block's window via a one-hot expansion
        # matmul (Mosaic has no vector lane-repeat; the MXU does this free)
        gp = blk.shape[1]
        start = pl.program_id(0) * width
        rows = jax.lax.broadcasted_iota(jnp.int32, (gp, width), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (gp, width), 1)
        expand = ((start + cols) // reps == rows).astype(jnp.float32)
        return jax.lax.dot_general(blk, expand, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    @pl.when(li == 0)
    def _():
        carry_f[...] = jnp.zeros_like(carry_f)
        carry_r[...] = jnp.zeros_like(carry_r)

    if emit_ckpt:
        # entry state of the chunk each lane set processes THIS step
        # (blocks are (1, 8, lanes) — row 0 holds the state, rows 1-7 are
        # tile-alignment padding required by Mosaic block-shape rules)
        hck_f_ref[0] = carry_f[...]
        hck_r_ref[0] = carry_r[...]

    # --- forward lanes: prefix scan, carry enters from the left
    dt = jax.nn.softplus(dt_f_ref[...].astype(jnp.float32)
                         + bias_f_ref[...].astype(jnp.float32))
    u = u_f_ref[...].astype(jnp.float32)
    a = jnp.exp(dt * A_f_ref[...].astype(jnp.float32))
    width = dt.shape[1]
    b = dt * u * lanes(bc_f_ref, width)
    a, b = _hs_prefix(a, b, chunk)
    h = b + a * carry_f[0:1, :]
    y_f_ref[...] = (lanes(cc_f_ref, width) * h
                    + D_f_ref[...].astype(jnp.float32) * u).astype(
                        y_f_ref.dtype)
    carry_f[0:1, :] = h[chunk - 1:chunk, :]

    # --- reversed lanes: suffix scan on the mirrored chunk, carry enters
    # from the right ((A,B) compose with the SUCCESSOR:
    # h_t = B_t + A_t*h_{t+span}, B <- B_t + A_t*B_{t+o}, A <- A_t*A_{t+o})
    dt = jax.nn.softplus(dt_r_ref[...].astype(jnp.float32)
                         + bias_r_ref[...].astype(jnp.float32))
    u = u_r_ref[...].astype(jnp.float32)
    a = jnp.exp(dt * A_r_ref[...].astype(jnp.float32))
    b = dt * u * lanes(bc_r_ref, width)
    a, b = _hs_suffix(a, b, chunk)
    h = b + a * carry_r[0:1, :]
    y_r_ref[...] = (lanes(cc_r_ref, width) * h
                    + D_r_ref[...].astype(jnp.float32) * u).astype(
                        y_r_ref.dtype)
    carry_r[0:1, :] = h[0:1, :]


@functools.partial(jax.jit,
                   static_argnames=("chunk", "lane_block", "group",
                                    "emit_ckpt"))
def _fused_bidir_lm(dt_f, u, bc_f, cc_f, dt_r, bc_r, cc_r,
                    A_f, D_f, bias_f, A_r, D_r, bias_r,
                    chunk=DEFAULT_CHUNK, lane_block=DEFAULT_LANE_BLOCK,
                    group=0, emit_ckpt=False):
    """(L, M) bidirectional fused scan; u is shared by both directions.

    With group=Dim > 0, bc/cc are COMPACT (L, M/Dim): lanes are grouped in
    runs of `group` channels sharing one scalar, lane blocks align to whole
    groups (or sit inside one), and the kernel expands the scalars in VMEM
    instead of reading pre-broadcast (L, M) planes from HBM.
    """
    L, M = dt_f.shape
    Lp = _round_up(max(L, chunk), chunk)
    Mp = _round_up(max(M, lane_block), lane_block)
    if group:
        assert lane_block % group == 0 or group % lane_block == 0
        reps = group
        Gp = Mp // group
    else:
        reps, Gp = 1, Mp

    def pad(x):
        return jnp.pad(x, ((0, Lp - x.shape[0]), (0, Mp - x.shape[1])))

    def pad_bc(x):
        return jnp.pad(x, ((0, Lp - x.shape[0]), (0, Gp - x.shape[1])))

    def pad_const(x, cv=0.0):
        return jnp.pad(x, ((0, 0), (0, Mp - M)), constant_values=cv)

    nl = Lp // chunk
    grid = (Mp // lane_block, nl)
    fwd_spec = pl.BlockSpec((chunk, lane_block), lambda m, l: (l, m),
                            memory_space=pltpu.VMEM)
    rev_spec = pl.BlockSpec((chunk, lane_block),
                            lambda m, l: (nl - 1 - l, m),
                            memory_space=pltpu.VMEM)
    # compact bc/cc travel FULL-width (tiny); the kernel selects its window
    bc_block = lane_block if not group else Gp
    bcf_spec = pl.BlockSpec((chunk, bc_block), lambda m, l: (l, 0 if group else m),
                            memory_space=pltpu.VMEM)
    bcr_spec = pl.BlockSpec((chunk, bc_block),
                            lambda m, l: (nl - 1 - l, 0 if group else m),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, lane_block), lambda m, l: (0, m),
                              memory_space=pltpu.VMEM)
    out_dtype = dt_f.dtype
    u_p = pad(u)
    out_specs = [fwd_spec, rev_spec]
    out_shape = [jax.ShapeDtypeStruct((Lp, Mp), out_dtype),
                 jax.ShapeDtypeStruct((Lp, Mp), out_dtype)]
    if emit_ckpt:
        out_specs += [pl.BlockSpec((1, 8, lane_block), lambda m, l: (l, 0, m),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 8, lane_block),
                                   lambda m, l: (nl - 1 - l, 0, m),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((nl, 8, Mp), jnp.float32),
                      jax.ShapeDtypeStruct((nl, 8, Mp), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_fused_bidir_kernel, chunk=chunk, reps=reps,
                          emit_ckpt=emit_ckpt),
        grid=grid,
        in_specs=[fwd_spec, fwd_spec, bcf_spec, bcf_spec,
                  rev_spec, rev_spec, bcr_spec, bcr_spec,
                  const_spec, const_spec, const_spec,
                  const_spec, const_spec, const_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, lane_block), jnp.float32),
                        pltpu.VMEM((8, lane_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(pad(dt_f), u_p, pad_bc(bc_f), pad_bc(cc_f),
      pad(dt_r), u_p, pad_bc(bc_r), pad_bc(cc_r),
      pad_const(A_f, -1.0), pad_const(D_f), pad_const(bias_f),
      pad_const(A_r, -1.0), pad_const(D_r), pad_const(bias_r))
    y_f, y_r = out[0][:L, :M], out[1][:L, :M]
    if emit_ckpt:
        return y_f, y_r, out[2], out[3]
    return y_f, y_r


def _bidir_plan(Dim):
    """(lane_block, group): lane blocks must align to whole (batch,
    direction) groups of Dim channels (or sit inside one); group=0 means
    the compact-B/C path is unavailable and pre-broadcast planes are used."""
    if 384 % Dim == 0 or Dim % 384 == 0:
        return 384, Dim
    if Dim % 512 == 0:
        return 512, Dim
    if Dim % 128 == 0:
        return 128, Dim
    return DEFAULT_LANE_BLOCK, 0


def _fused_bidir_impl(u2, dt4, bc4, cc4, A, D, delta_bias, emit_ckpt=False):
    B, K2, L, Dim = u2.shape
    M = B * K2 * Dim
    G = B * K2
    # lanes stay channel-minor (lane = (b*K2 + j)*Dim + d, cheap relayout);
    # the N=1 B/C scalars are constant over each Dim-long lane group, so
    # they ship compact as one column per (b, j) group
    to_lm = lambda x: x.transpose(2, 0, 1, 3).reshape(L, M)
    half = lambda x: jnp.tile(x, B)[None].astype(jnp.float32)
    lane_block, group = _bidir_plan(Dim)

    if group:
        to_c = lambda x: x[..., 0].transpose(2, 0, 1).reshape(L, G)
        bc_f, bc_r = to_c(bc4[:, :2]), to_c(bc4[:, 2:])
        cc_f, cc_r = to_c(cc4[:, :2]), to_c(cc4[:, 2:])
    else:
        bcb = jnp.broadcast_to(bc4, (B, 4, L, Dim))
        ccb = jnp.broadcast_to(cc4, (B, 4, L, Dim))
        bc_f, bc_r = to_lm(bcb[:, :2]), to_lm(bcb[:, 2:])
        cc_f, cc_r = to_lm(ccb[:, :2]), to_lm(ccb[:, 2:])

    HD = K2 * Dim
    out = _fused_bidir_lm(
        to_lm(dt4[:, :2]), to_lm(u2), bc_f, cc_f,
        to_lm(dt4[:, 2:]), bc_r, cc_r,
        half(A[:HD]), half(D[:HD]), half(delta_bias[:HD]),
        half(A[HD:]), half(D[HD:]), half(delta_bias[HD:]),
        lane_block=lane_block, group=group, emit_ckpt=emit_ckpt)
    from_lm = lambda y: y.reshape(L, B, K2, Dim).transpose(1, 2, 0, 3)
    y4 = jnp.concatenate([from_lm(out[0]), from_lm(out[1])], axis=1)
    if emit_ckpt:
        return y4, (out[2], out[3])
    return y4


def _fused_bidir_bwd_kernel(dt_f_ref, u_f_ref, bc_f_ref, cc_f_ref, g_f_ref,
                            hck_f_ref,
                            dt_r_ref, u_r_ref, bc_r_ref, cc_r_ref, g_r_ref,
                            hck_r_ref,
                            A_f_ref, D_f_ref, bias_f_ref,
                            A_r_ref, D_r_ref, bias_r_ref,
                            du_f_ref, ddt_f_ref, dbc_f_ref, dcc_f_ref,
                            du_r_ref, ddt_r_ref, dbc_r_ref, dcc_r_ref,
                            dA_f_ref, dD_f_ref, dbias_f_ref,
                            dA_r_ref, dD_r_ref, dbias_r_ref,
                            ecar_f, ecar_r, acc_f, acc_r, *, chunk, reps):
    """Fused backward of the bidirectional scan — the Pallas analog of the
    reference reverse_scan.cuh + selective_scan_bwd_kernel_oflex.cuh: one
    pass that RECOMPUTES h per chunk from the forward's entry-state
    checkpoints (no (L, M) h residual in HBM) and runs the adjoint
    recurrence as a local Hillis-Steele scan via the substitution
    e_t = a_t * dh_t, which makes both directions' adjoint recurrences
    chunk-local:
        fwd lanes:  dh_t = gC_t + a_{t+1} dh_{t+1}
                    => e_t = a_t gC_t + a_t e_{t+1}   (suffix scan)
        rev lanes:  dh_t = gC_t + a_{t-1} dh_{t-1}
                    => e_t = a_t gC_t + a_t e_{t-1}   (prefix scan)
    The grid mirrors the forward with the lane-set directions SWAPPED
    (fwd-lane blocks iterate right-to-left so the adjoint carry flows
    backward; rev-lane blocks left-to-right). dA/dD/dbias accumulate in
    VMEM scratch across chunks; dB/dC group-reduce on the MXU into compact
    (L, G) outputs (scattered to global group columns, summed over lane
    blocks outside)."""
    li = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(li == 0)
    def _():
        ecar_f[...] = jnp.zeros_like(ecar_f)
        ecar_r[...] = jnp.zeros_like(ecar_r)
        acc_f[...] = jnp.zeros_like(acc_f)
        acc_r[...] = jnp.zeros_like(acc_r)

    width = dt_f_ref.shape[1]
    gp_all = dcc_f_ref.shape[-1]

    def lane_expand(ref):
        blk = ref[...].astype(jnp.float32)
        if reps == 1:
            return blk
        gp = blk.shape[1]
        start = pl.program_id(0) * width
        rows = jax.lax.broadcasted_iota(jnp.int32, (gp, width), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (gp, width), 1)
        expand = ((start + cols) // reps == rows).astype(jnp.float32)
        return jax.lax.dot_general(blk, expand, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def group_reduce(x):
        # (chunk, width) -> (chunk, G_total): sum lanes of each group into
        # its GLOBAL group column (zero elsewhere; lane blocks summed
        # outside over the leading m axis of the output array)
        if reps == 1:
            return x
        start = pl.program_id(0) * width
        rows = jax.lax.broadcasted_iota(jnp.int32, (width, gp_all), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (width, gp_all), 1)
        scatter = ((start + rows) // reps == cols).astype(jnp.float32)
        return jax.lax.dot_general(x, scatter, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def lane_set(dt_ref, u_ref, bc_ref, cc_ref, g_ref, hck_ref,
                 A_ref, D_ref, bias_ref, ecar, acc, suffix_h):
        dtr = dt_ref[...].astype(jnp.float32) + bias_ref[...].astype(
            jnp.float32)
        dt = jax.nn.softplus(dtr)
        sig = jax.nn.sigmoid(dtr)
        u = u_ref[...].astype(jnp.float32)
        A = A_ref[...].astype(jnp.float32)
        a = jnp.exp(dt * A)
        bs = lane_expand(bc_ref)
        cs = lane_expand(cc_ref)
        b = dt * u * bs
        h0 = hck_ref[0, 0:1, :].astype(jnp.float32)  # (1, width) entry state
        if suffix_h:
            asc, bsc = _hs_suffix(a, b, chunk)
            h = bsc + asc * h0
            h_nb = jnp.concatenate([h[1:], h0], axis=0)   # h_{t+1}
        else:
            asc, bsc = _hs_prefix(a, b, chunk)
            h = bsc + asc * h0
            h_nb = jnp.concatenate([h0, h[:-1]], axis=0)  # h_{t-1}
        g = g_ref[...].astype(jnp.float32)
        gC = g * cs
        carry_old = ecar[0:1, :]
        if suffix_h:
            # h was a suffix scan -> adjoint e is a PREFIX scan
            ea, eb = _hs_prefix(a, a * gC, chunk)
            e = eb + ea * carry_old
            e_nb = jnp.concatenate([carry_old, e[:-1]], axis=0)
            ecar[0:1, :] = e[chunk - 1:chunk, :]
        else:
            ea, eb = _hs_suffix(a, a * gC, chunk)
            e = eb + ea * carry_old
            e_nb = jnp.concatenate([e[1:], carry_old], axis=0)
            ecar[0:1, :] = e[0:1, :]
        dh = gC + e_nb
        da = dh * h_nb                               # d loss / d a_t
        ddt = dh * u * bs + da * A * a
        ddtraw = ddt * sig
        du = g * D_ref[...].astype(jnp.float32) + dh * dt * bs
        acc[0:1, :] += jnp.sum(da * a * dt, axis=0, keepdims=True)   # dA
        acc[1:2, :] += jnp.sum(g * u, axis=0, keepdims=True)         # dD
        acc[2:3, :] += jnp.sum(ddtraw, axis=0, keepdims=True)        # dbias
        return du, ddtraw, group_reduce(dh * dt * u), group_reduce(g * h)

    du, ddt, dbc, dcc = lane_set(dt_f_ref, u_f_ref, bc_f_ref, cc_f_ref,
                                 g_f_ref, hck_f_ref, A_f_ref, D_f_ref,
                                 bias_f_ref, ecar_f, acc_f, suffix_h=False)
    du_f_ref[...] = du
    ddt_f_ref[...] = ddt
    dbc_f_ref[...] = dbc[None]
    dcc_f_ref[...] = dcc[None]

    du, ddt, dbc, dcc = lane_set(dt_r_ref, u_r_ref, bc_r_ref, cc_r_ref,
                                 g_r_ref, hck_r_ref, A_r_ref, D_r_ref,
                                 bias_r_ref, ecar_r, acc_r, suffix_h=True)
    du_r_ref[...] = du
    ddt_r_ref[...] = ddt
    dbc_r_ref[...] = dbc[None]
    dcc_r_ref[...] = dcc[None]

    @pl.when(li == nl - 1)
    def _():
        dA_f_ref[...] = acc_f[0:1, :]
        dD_f_ref[...] = acc_f[1:2, :]
        dbias_f_ref[...] = acc_f[2:3, :]
        dA_r_ref[...] = acc_r[0:1, :]
        dD_r_ref[...] = acc_r[1:2, :]
        dbias_r_ref[...] = acc_r[2:3, :]


@functools.partial(jax.jit,
                   static_argnames=("chunk", "lane_block", "group"))
def _fused_bidir_bwd_lm(dt_f, u, bc_f, cc_f, g_f, hck_f,
                        dt_r, bc_r, cc_r, g_r, hck_r,
                        A_f, D_f, bias_f, A_r, D_r, bias_r,
                        chunk=DEFAULT_CHUNK, lane_block=DEFAULT_LANE_BLOCK,
                        group=0):
    """(L, M) fused bidirectional backward. Compact path only (group=Dim).

    Returns du (summed over both lane sets), ddt_f, ddt_r (L, M),
    dbc_f/dbc_r/dcc_f/dcc_r compact (L, G), and per-lane dA/dD/dbias
    (1, M) per direction half.
    """
    L, M = dt_f.shape
    assert group > 0
    Lp = _round_up(max(L, chunk), chunk)
    Mp = _round_up(max(M, lane_block), lane_block)
    reps = group
    Gp = Mp // group

    def pad(x):
        return jnp.pad(x, ((0, Lp - x.shape[0]), (0, Mp - x.shape[1])))

    def pad_bc(x):
        return jnp.pad(x, ((0, Lp - x.shape[0]), (0, Gp - x.shape[1])))

    def pad_const(x, cv=0.0):
        return jnp.pad(x, ((0, 0), (0, Mp - M)), constant_values=cv)

    nl = Lp // chunk
    nm = Mp // lane_block
    grid = (nm, nl)
    # the backward swaps the lane sets' traversal directions (adjoint
    # carries flow opposite to the forward state)
    fwd_spec = pl.BlockSpec((chunk, lane_block),
                            lambda m, l: (nl - 1 - l, m),
                            memory_space=pltpu.VMEM)
    rev_spec = pl.BlockSpec((chunk, lane_block), lambda m, l: (l, m),
                            memory_space=pltpu.VMEM)
    bcf_spec = pl.BlockSpec((chunk, Gp), lambda m, l: (nl - 1 - l, 0),
                            memory_space=pltpu.VMEM)
    bcr_spec = pl.BlockSpec((chunk, Gp), lambda m, l: (l, 0),
                            memory_space=pltpu.VMEM)
    hckf_spec = pl.BlockSpec((1, 8, lane_block),
                             lambda m, l: (nl - 1 - l, 0, m),
                             memory_space=pltpu.VMEM)
    hckr_spec = pl.BlockSpec((1, 8, lane_block), lambda m, l: (l, 0, m),
                             memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((1, lane_block), lambda m, l: (0, m),
                              memory_space=pltpu.VMEM)
    # compact dB/dC outputs: per-lane-block scatter planes (m, Lp, Gp),
    # summed over m by the caller (Gp is tiny: one column per (b, dir))
    dbcf_spec = pl.BlockSpec((1, chunk, Gp), lambda m, l: (m, nl - 1 - l, 0),
                             memory_space=pltpu.VMEM)
    dbcr_spec = pl.BlockSpec((1, chunk, Gp), lambda m, l: (m, l, 0),
                             memory_space=pltpu.VMEM)

    u_p = pad(u)
    outs = pl.pallas_call(
        functools.partial(_fused_bidir_bwd_kernel, chunk=chunk, reps=reps),
        grid=grid,
        in_specs=[fwd_spec, fwd_spec, bcf_spec, bcf_spec, fwd_spec,
                  hckf_spec,
                  rev_spec, rev_spec, bcr_spec, bcr_spec, rev_spec,
                  hckr_spec,
                  const_spec, const_spec, const_spec,
                  const_spec, const_spec, const_spec],
        out_specs=[fwd_spec, fwd_spec, dbcf_spec, dbcf_spec,
                   rev_spec, rev_spec, dbcr_spec, dbcr_spec,
                   const_spec, const_spec, const_spec,
                   const_spec, const_spec, const_spec],
        out_shape=[jax.ShapeDtypeStruct((Lp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((Lp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((nm, Lp, Gp), jnp.float32),
                   jax.ShapeDtypeStruct((nm, Lp, Gp), jnp.float32),
                   jax.ShapeDtypeStruct((Lp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((Lp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((nm, Lp, Gp), jnp.float32),
                   jax.ShapeDtypeStruct((nm, Lp, Gp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, lane_block), jnp.float32),
                        pltpu.VMEM((8, lane_block), jnp.float32),
                        pltpu.VMEM((8, lane_block), jnp.float32),
                        pltpu.VMEM((8, lane_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(pad(dt_f), u_p, pad_bc(bc_f), pad_bc(cc_f), pad(g_f), hck_f,
      pad(dt_r), u_p, pad_bc(bc_r), pad_bc(cc_r), pad(g_r), hck_r,
      pad_const(A_f, -1.0), pad_const(D_f), pad_const(bias_f),
      pad_const(A_r, -1.0), pad_const(D_r), pad_const(bias_r))
    (du_f, ddt_f, dbc_f, dcc_f, du_r, ddt_r, dbc_r, dcc_r,
     dA_f, dD_f, dbias_f, dA_r, dD_r, dbias_r) = outs
    G = M // group
    du = (du_f + du_r)[:L, :M]
    return (du, ddt_f[:L, :M], ddt_r[:L, :M],
            dbc_f.sum(0)[:L, :G], dcc_f.sum(0)[:L, :G],
            dbc_r.sum(0)[:L, :G], dcc_r.sum(0)[:L, :G],
            dA_f[:, :M], dD_f[:, :M], dbias_f[:, :M],
            dA_r[:, :M], dD_r[:, :M], dbias_r[:, :M])


def _fused_bidir_bwd_impl(res_args, hck, g4):
    """Layout glue around the backward kernel: relayout the saved primal
    args and the (B, 4, L, Dim) cotangent to (L, M), run the kernel, map
    cotangents back to the primal layouts/dtypes."""
    u2, dt4, bc4, cc4, A, D, delta_bias = res_args
    hck_f, hck_r = hck
    B, K2, L, Dim = u2.shape
    M = B * K2 * Dim
    G = B * K2
    HD = K2 * Dim
    lane_block, group = _bidir_plan(Dim)
    to_lm = lambda x: x.transpose(2, 0, 1, 3).reshape(L, M)
    to_c = lambda x: x[..., 0].transpose(2, 0, 1).reshape(L, G)
    half = lambda x: jnp.tile(x, B)[None].astype(jnp.float32)

    g4 = g4.astype(jnp.float32)
    (du, ddt_f, ddt_r, dbc_f, dcc_f, dbc_r, dcc_r,
     dA_f, dD_f, dbias_f, dA_r, dD_r, dbias_r) = _fused_bidir_bwd_lm(
        to_lm(dt4[:, :2]), to_lm(u2), to_c(bc4[:, :2]), to_c(cc4[:, :2]),
        to_lm(g4[:, :2]), hck_f,
        to_lm(dt4[:, 2:]), to_c(bc4[:, 2:]), to_c(cc4[:, 2:]),
        to_lm(g4[:, 2:]), hck_r,
        half(A[:HD]), half(D[:HD]), half(delta_bias[:HD]),
        half(A[HD:]), half(D[HD:]), half(delta_bias[HD:]),
        lane_block=lane_block, group=group)

    from_lm = lambda y: y.reshape(L, B, K2, Dim).transpose(1, 2, 0, 3)
    from_c = lambda y: y.reshape(L, B, K2).transpose(1, 2, 0)[..., None]
    du2 = from_lm(du).astype(u2.dtype)
    ddt4 = jnp.concatenate([from_lm(ddt_f), from_lm(ddt_r)],
                           axis=1).astype(dt4.dtype)
    dbc4 = jnp.concatenate([from_c(dbc_f), from_c(dbc_r)],
                           axis=1).astype(bc4.dtype)
    dcc4 = jnp.concatenate([from_c(dcc_f), from_c(dcc_r)],
                           axis=1).astype(cc4.dtype)
    # per-lane consts were tiled over batch: sum the batch copies
    red = lambda x: x.reshape(B, HD).sum(0)
    dA = jnp.concatenate([red(dA_f), red(dA_r)]).astype(A.dtype)
    dD = jnp.concatenate([red(dD_f), red(dD_r)]).astype(D.dtype)
    dbias = jnp.concatenate([red(dbias_f), red(dbias_r)]).astype(
        delta_bias.dtype)
    return du2, ddt4, dbc4, dcc4, dA, dD, dbias


def _fused_bidir_tok_impl(u_t, dt_t, bc_t, cc_t, A, D, delta_bias,
                          emit_ckpt=False):
    """Token-layout bidirectional scan: operands already in the kernel's
    (L, M) lane order, so the only layout ops are free reshapes.

    u_t (L, B, 2, Dim); dt_t (2, L, B, 2, Dim); bc_t/cc_t (2, L, B, 2);
    A/D/delta_bias (4*Dim,) ordered [r=0 j=0 | r=0 j=1 | r=1 j=0 | r=1 j=1].
    Returns (y_f, y_r) each (L, B, 2, Dim) in base token order.
    """
    L, B, K2, Dim = u_t.shape
    M = B * K2 * Dim
    G = B * K2
    HD = K2 * Dim
    lane_block, group = _bidir_plan(Dim)
    assert group > 1, "token layout requires the compact-group plan"
    half = lambda x: jnp.tile(x, B)[None].astype(jnp.float32)
    out = _fused_bidir_lm(
        dt_t[0].reshape(L, M), u_t.reshape(L, M),
        bc_t[0].reshape(L, G), cc_t[0].reshape(L, G),
        dt_t[1].reshape(L, M),
        bc_t[1].reshape(L, G), cc_t[1].reshape(L, G),
        half(A[:HD]), half(D[:HD]), half(delta_bias[:HD]),
        half(A[HD:]), half(D[HD:]), half(delta_bias[HD:]),
        lane_block=lane_block, group=group, emit_ckpt=emit_ckpt)
    y = (out[0].reshape(L, B, K2, Dim), out[1].reshape(L, B, K2, Dim))
    if emit_ckpt:
        return y, (out[2], out[3])
    return y


@jax.custom_vjp
def selective_scan_fused_bidir_tok(u_t, dt_t, bc_t, cc_t, A, D, delta_bias):
    """Relayout-free variant of selective_scan_fused_bidir: SS2D's
    projections emit operands directly in the kernel's token-major layout
    (einsum output order), eliminating the (B, K, L, D) <-> (L, M)
    transposes around the kernel — the 'data formatting' tail the xprof
    breakdown flagged. Same math, same fused backward."""
    return _fused_bidir_tok_impl(u_t, dt_t, bc_t, cc_t, A, D, delta_bias)


def _fused_bidir_tok_fwd(*args):
    y, hck = _fused_bidir_tok_impl(*args, emit_ckpt=True)
    return y, (args, hck)


def _fused_bidir_tok_bwd(res, g):
    (u_t, dt_t, bc_t, cc_t, A, D, delta_bias), hck = res
    hck_f, hck_r = hck
    L, B, K2, Dim = u_t.shape
    M = B * K2 * Dim
    G = B * K2
    HD = K2 * Dim
    lane_block, group = _bidir_plan(Dim)
    half = lambda x: jnp.tile(x, B)[None].astype(jnp.float32)
    g_f = g[0].astype(jnp.float32).reshape(L, M)
    g_r = g[1].astype(jnp.float32).reshape(L, M)
    (du, ddt_f, ddt_r, dbc_f, dcc_f, dbc_r, dcc_r,
     dA_f, dD_f, dbias_f, dA_r, dD_r, dbias_r) = _fused_bidir_bwd_lm(
        dt_t[0].reshape(L, M), u_t.reshape(L, M),
        bc_t[0].reshape(L, G), cc_t[0].reshape(L, G), g_f, hck_f,
        dt_t[1].reshape(L, M),
        bc_t[1].reshape(L, G), cc_t[1].reshape(L, G), g_r, hck_r,
        half(A[:HD]), half(D[:HD]), half(delta_bias[:HD]),
        half(A[HD:]), half(D[HD:]), half(delta_bias[HD:]),
        lane_block=lane_block, group=group)
    du_t = du.reshape(L, B, K2, Dim).astype(u_t.dtype)
    ddt_t = jnp.stack([ddt_f.reshape(L, B, K2, Dim),
                       ddt_r.reshape(L, B, K2, Dim)]).astype(dt_t.dtype)
    dbc_t = jnp.stack([dbc_f.reshape(L, B, K2),
                       dbc_r.reshape(L, B, K2)]).astype(bc_t.dtype)
    dcc_t = jnp.stack([dcc_f.reshape(L, B, K2),
                       dcc_r.reshape(L, B, K2)]).astype(cc_t.dtype)
    red = lambda x: x.reshape(B, HD).sum(0)
    dA = jnp.concatenate([red(dA_f), red(dA_r)]).astype(A.dtype)
    dDc = jnp.concatenate([red(dD_f), red(dD_r)]).astype(D.dtype)
    dbias = jnp.concatenate([red(dbias_f), red(dbias_r)]).astype(
        delta_bias.dtype)
    return du_t, ddt_t, dbc_t, dcc_t, dA, dDc, dbias


selective_scan_fused_bidir_tok.defvjp(_fused_bidir_tok_fwd,
                                      _fused_bidir_tok_bwd)


def _unfused_bidir_ref(u2, dt4, bc4, cc4, A, D, delta_bias):
    """jnp reference of the bidirectional scan (flip-based) — used for the
    backward pass; linear_scan supplies the recurrence vjp."""
    flip2 = lambda x: jnp.flip(x, axis=2)
    u4 = jnp.concatenate([u2, flip2(u2)], axis=1)
    dtf = jnp.concatenate([dt4[:, :2], flip2(dt4[:, 2:])], axis=1)
    bcf = jnp.concatenate([bc4[:, :2], flip2(bc4[:, 2:])], axis=1)
    ccf = jnp.concatenate([cc4[:, :2], flip2(cc4[:, 2:])], axis=1)
    y = _unfused_bkld_ref(u4, dtf, A, bcf, ccf, D, delta_bias)
    return jnp.concatenate([y[:, :2], flip2(y[:, 2:])], axis=1)


@jax.custom_vjp
def selective_scan_fused_bidir(u2, dt4, bc4, cc4, A, D, delta_bias):
    """N=1 fused scan over the two cross2d base orders and their reversals.

    u2: (B, 2, L, Dim) row-major / col-major token orders (UNFLIPPED);
    dt4/bc4/cc4: (B, 4, L, *) per-direction values in base order (the
    projections commute with the token permutation, so directions 2/3 are
    computed without flipping); A/D/delta_bias: (4*Dim,).
    Returns (B, 4, L, Dim) with directions 2/3 already back in base order —
    cross-merge becomes a flip-free sum.
    """
    return _fused_bidir_impl(u2, dt4, bc4, cc4, A, D, delta_bias)


def _fused_bidir_fwd(*args):
    import os
    u2 = args[0]
    if (_bidir_plan(u2.shape[-1])[1] > 1
            and not os.environ.get("XPOINT_UNFUSED_BWD")):
        # compact-group path: run the kernel emitting per-chunk entry-state
        # checkpoints so the fused backward kernel can recompute h locally
        y4, hck = _fused_bidir_impl(*args, emit_ckpt=True)
        return y4, (args, hck)
    return _fused_bidir_impl(*args), (args, None)


def _fused_bidir_bwd(res, g):
    args, hck = res
    if hck is not None:
        return _fused_bidir_bwd_impl(args, hck, g)
    # group-less layouts: differentiate through the flip-based jnp
    # composition (linear_scan supplies the recurrence vjp)
    _, vjp = jax.vjp(_unfused_bidir_ref, *args)
    return vjp(g.astype(jnp.float32))


selective_scan_fused_bidir.defvjp(_fused_bidir_fwd, _fused_bidir_bwd)


@jax.custom_vjp
def selective_scan_fused(u, delta, A, Bmat, Cmat, D, delta_bias):
    return _selective_scan_fused_impl(u, delta, A, Bmat, Cmat, D, delta_bias)


def _fused_fwd(u, delta, A, Bmat, Cmat, D, delta_bias):
    y = _selective_scan_fused_impl(u, delta, A, Bmat, Cmat, D, delta_bias)
    return y, (u, delta, A, Bmat, Cmat, D, delta_bias)


def _fused_bwd(res, g):
    # gradient through the unfused composition (linear_scan has its own vjp);
    # must NOT re-enter the fused dispatch or the vjp would recurse
    _, vjp = jax.vjp(lambda *a: _selective_scan_unfused(*a, True), *res)
    return vjp(g.astype(jnp.float32))


selective_scan_fused.defvjp(_fused_fwd, _fused_bwd)


def selective_scan_pallas(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                          delta_softplus=True):
    """Selective scan with the Pallas recurrence kernel.

    Same contract as ops.selective_scan.selective_scan_* (reference layout:
    u/delta (B, K*C, L); A (K*C, N); Bmat/Cmat (B, K, N, L)); fp32 output.
    N=1 with delta_softplus dispatches to the fully fused kernel.
    """
    if Bmat.shape[2] == 1 and delta_softplus:
        return selective_scan_fused(u, delta, A, Bmat, Cmat, D, delta_bias)
    return _selective_scan_unfused(u, delta, A, Bmat, Cmat, D, delta_bias,
                                   delta_softplus)


def _selective_scan_unfused(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                            delta_softplus=True):
    Batch, K, N, L = Bmat.shape
    KC = u.shape[1]
    Cdim = KC // K

    u = u.astype(jnp.float32)
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    A = A.astype(jnp.float32)
    Bx = jnp.repeat(Bmat.astype(jnp.float32), Cdim, axis=1)   # (B, KC, N, L)
    Cx = jnp.repeat(Cmat.astype(jnp.float32), Cdim, axis=1)

    a = jnp.exp(jnp.einsum("bdl,dn->bdnl", dt, A))            # (B, KC, N, L)
    b = jnp.einsum("bdl,bdnl,bdl->bdnl", dt, Bx, u)

    # (B, KC, N, L) -> (L, B*KC*N)
    M = Batch * KC * N
    a_lm = a.reshape(M, L).T
    b_lm = b.reshape(M, L).T
    h = linear_scan(a_lm, b_lm)                               # (L, M)
    h = h.T.reshape(Batch, KC, N, L)

    y = jnp.einsum("bdnl,bdnl->bdl", h, Cx)
    if D is not None:
        y = y + u * D.astype(jnp.float32)[None, :, None]
    return y

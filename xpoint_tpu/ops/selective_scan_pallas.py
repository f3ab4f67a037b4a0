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


def selective_scan_pallas(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                          delta_softplus=True):
    """Selective scan with the Pallas recurrence kernel.

    Same contract as ops.selective_scan.selective_scan_* (reference layout:
    u/delta (B, K*C, L); A (K*C, N); Bmat/Cmat (B, K, N, L)); fp32 output.
    """
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

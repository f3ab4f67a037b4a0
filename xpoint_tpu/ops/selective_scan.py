"""Selective scan (Mamba S6 recurrence) for TPU.

The core op of the VMamba/SS2D encoder. Semantics follow the reference
oracle ``selective_scan_torch`` (vmamba_src/csms6s.py:25-68) and the CUDA
kernel it dispatches to (cusoflex/selective_scan_fwd_kernel_oflex.cuh):

    delta = softplus(delta + delta_bias)
    h_t   = exp(delta_t * A) * h_{t-1} + delta_t * B_t * u_t      (fp32 state)
    y_t   = <C_t, h_t> + D * u_t

Backends:
    'ref'    sequential lax.scan — the parity oracle, O(L) steps.
    'assoc'  jax.lax.associative_scan over the (a, b) pair recurrence
             (a2*a1, a2*b1 + b2) — the combine op of the CUDA kernel's
             cub BlockScan (selective_scan_common.h:92-97). Fully
             differentiable through XLA; the default.
    'pallas' chunked Pallas TPU kernel (ops/selective_scan_pallas.py),
             fp32 carry between L-chunks — the direct analog of the CUDA
             kernel's chunked prefix-callback scan (selective_scan.h:29).

All backends take the reference argument layout so the kernel parity tests
(ported from test_selective_scan_easy.py) compare directly:
    u, delta: (B, K*C, L);  A: (K*C, N);  Bmat, Cmat: (B, K, N, L)
    D, delta_bias: (K*C,)
Returns y: (B, K*C, L) in float32 (ssoflex semantics).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _prepare(u, delta, A, Bmat, Cmat, delta_bias, delta_softplus):
    """Common input prep in fp32. Returns (u, dt, A, B, C) with
    B/C expanded from groups K to K*C channels."""
    Batch, K, N, L = Bmat.shape
    KC = u.shape[1]
    Cdim = KC // K

    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    A = A.astype(jnp.float32)
    # (B, K, N, L) -> (B, K*C, N, L) by repeating within each group
    Bx = jnp.repeat(Bmat.astype(jnp.float32), Cdim, axis=1)
    Cx = jnp.repeat(Cmat.astype(jnp.float32), Cdim, axis=1)
    return u, delta, A, Bx, Cx


def _finalize(y, u, D):
    if D is not None:
        y = y + u * D.astype(jnp.float32)[None, :, None]
    return y


def selective_scan_ref(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                       delta_softplus=True):
    """Sequential lax.scan oracle — reference semantics, step by step."""
    u, dt, A, Bx, Cx = _prepare(u, delta, A, Bmat, Cmat, delta_bias, delta_softplus)
    Batch, KC, L = u.shape
    N = A.shape[1]

    deltaA = jnp.exp(jnp.einsum("bdl,dn->bdln", dt, A))       # (B, KC, L, N)
    deltaBu = jnp.einsum("bdl,bdnl,bdl->bdln", dt, Bx, u)     # (B, KC, L, N)

    def step(h, inputs):
        a_t, b_t, c_t = inputs
        h = a_t * h + b_t
        y_t = jnp.sum(h * c_t, axis=-1)
        return h, y_t

    h0 = jnp.zeros((Batch, KC, N), jnp.float32)
    xs = (deltaA.transpose(2, 0, 1, 3), deltaBu.transpose(2, 0, 1, 3),
          Cx.transpose(3, 0, 1, 2))
    _, ys = jax.lax.scan(step, h0, xs)
    y = ys.transpose(1, 2, 0)                                  # (B, KC, L)
    return _finalize(y, u, D)


def selective_scan_assoc(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                         delta_softplus=True):
    """Parallel scan via jax.lax.associative_scan on the first-order
    recurrence pairs — the TPU-idiomatic default."""
    u, dt, A, Bx, Cx = _prepare(u, delta, A, Bmat, Cmat, delta_bias, delta_softplus)

    a = jnp.exp(jnp.einsum("bdl,dn->bdln", dt, A))             # (B, KC, L, N)
    b = jnp.einsum("bdl,bdnl,bdl->bdln", dt, Bx, u)            # (B, KC, L, N)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=2)
    y = jnp.einsum("bdln,bdnl->bdl", h, Cx)
    return _finalize(y, u, D)


def selective_scan(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                   delta_softplus=True, backend="assoc"):
    """Dispatching entry point (parity: csms6s.py:112-126).

    backend='ring' is the sequence-parallel scale-out path: L sharded over
    the mesh installed with parallel.ring_scan.ring_mesh(mesh) (opt-in,
    for images whose sequence exceeds one chip)."""
    if backend == "ring":
        from ..parallel.ring_scan import ring_selective_scan, get_ring_mesh
        mesh, axis_name = get_ring_mesh()
        return ring_selective_scan(u, delta, A, Bmat, Cmat, D, delta_bias,
                                   delta_softplus, mesh, axis_name)
    return _selective_scan_jit(u, delta, A, Bmat, Cmat, D, delta_bias,
                               delta_softplus, backend)


@partial(jax.jit, static_argnames=("delta_softplus", "backend"))
def _selective_scan_jit(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                        delta_softplus=True, backend="assoc"):
    if backend == "ref":
        fn = selective_scan_ref
    elif backend == "assoc":
        fn = selective_scan_assoc
    elif backend == "pallas":
        from .selective_scan_pallas import selective_scan_pallas
        fn = selective_scan_pallas
    else:
        raise ValueError(f"unknown selective_scan backend: {backend}")
    return fn(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus)


def flops_selective_scan(B=1, L=256, D=768, N=16, with_D=True):
    """FLOP accounting identical to the reference (csms6s.py:139-160)."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    return flops

"""Sequence-parallel linear recurrence: the scan's TIME axis sharded over
the device mesh.

The reference's long-sequence mechanism is the chunked CUDA scan with a
running-prefix callback (selective_scan.h:29, selective_scan_common.h:99+)
— single-device by construction. The TPU-native scale-out analog shards
L over the ICI mesh and passes state between chips with one collective:

  1. each shard runs the LOCAL chunked Pallas scan (ops/selective_scan_pallas),
  2. shards exchange their (prod a, last h) summaries — one tiny
     all_gather, a ring over ICI,
  3. each shard combines the exclusive prefix of its predecessors with the
     scan-combine law ((A1,B1) o (A2,B2) = (A1*A2, A2*B1 + B2)) and
     re-runs its local scan seeded with the incoming state (folding the
     seed into b_0: h_0 = a_0*h_in + b_0).

Cost: 2x the local scan + one (n_shards, M) all_gather. Correct for any
first-order recurrence; gradients flow through linear_scan's custom VJP
under shard_map.

This is for images whose sequence exceeds one chip's capacity (SURVEY.md
§2 parallelism inventory: "shard L across ICI with state handoff");
single-chip workloads keep the plain kernel.
"""
import contextlib

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.selective_scan_pallas import linear_scan
from .mesh import DATA_AXIS


# Active mesh for the 'ring' selective-scan backend (set with ring_mesh()
# around model construction/apply; consumed by ops.selective_scan when a
# model is built with scan_backend='ring').
_RING_MESH = None


@contextlib.contextmanager
def ring_mesh(mesh, axis_name=DATA_AXIS):
    """Context manager selecting the mesh/axis the 'ring' scan backend
    shards the sequence axis over."""
    global _RING_MESH
    prev = _RING_MESH
    _RING_MESH = (mesh, axis_name)
    try:
        yield
    finally:
        _RING_MESH = prev


def get_ring_mesh():
    if _RING_MESH is None:
        raise RuntimeError(
            "scan_backend='ring' needs an active mesh: wrap model apply in "
            "xpoint_tpu.parallel.ring_mesh(mesh) (sequence-parallel scan "
            "shards L over that mesh axis)")
    return _RING_MESH


def ring_linear_scan(a, b, mesh, axis_name=DATA_AXIS):
    """h_t = a_t * h_{t-1} + b_t (h_0 = 0) over axis 0 of (L, M) arrays,
    with L sharded over `mesh`'s `axis_name` axis. Returns h, L-sharded
    the same way. L must divide evenly by the mesh size."""

    def body(a_blk, b_blk):                      # (L/n, M) per shard
        h_loc = linear_scan(a_blk, b_blk)        # local inclusive scan
        A_last = jnp.prod(a_blk, axis=0)         # shard summary (M,)
        B_last = h_loc[-1]
        A_all = jax.lax.all_gather(A_last, axis_name)   # (n, M) ring
        B_all = jax.lax.all_gather(B_last, axis_name)

        def comb(c1, c2):
            A1, B1 = c1
            A2, B2 = c2
            return A1 * A2, A2 * B1 + B2

        A_pre, B_pre = jax.lax.associative_scan(comb, (A_all, B_all), axis=0)
        idx = jax.lax.axis_index(axis_name)
        h_in = jax.lax.dynamic_index_in_dim(
            B_pre, jnp.maximum(idx - 1, 0), 0, keepdims=False)
        h_in = jnp.where(idx > 0, h_in, 0.0)
        # seed the local scan with the incoming state via b_0
        b_seeded = b_blk.at[0].add(a_blk[0] * h_in)
        return linear_scan(a_blk, b_seeded)

    # check_vma=False: the Pallas scan inside doesn't annotate varying-
    # across-mesh info on its output avals (jax >= 0.8 vma checking)
    return shard_map(body, mesh=mesh,
                     in_specs=(P(axis_name), P(axis_name)),
                     out_specs=P(axis_name), check_vma=False)(a, b)


def ring_selective_scan(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                        delta_softplus=True, mesh=None, axis_name=DATA_AXIS):
    """Sequence-parallel selective scan: the S6 recurrence with L sharded
    over `mesh`'s `axis_name` — SS2D's scale-out path for images whose
    sequence exceeds one chip (opt-in via scan_backend='ring').

    Same argument layout and semantics as ops.selective_scan (reference
    csms6s.py:112-126); the recurrence state crosses shard boundaries via
    the (prod a, last h) summary exchange of ring_linear_scan — the
    TPU-native analog of the CUDA kernel's chunked running-prefix callback
    (selective_scan_common.h:99+) stretched across the ICI mesh.

    L must divide evenly by the mesh size.
    """
    from ..ops.selective_scan import _prepare, _finalize

    n = mesh.shape[axis_name]
    L = u.shape[-1]
    assert L % n == 0, f"L={L} not divisible by mesh size {n}"
    u32, dt, A32, Bx, Cx = _prepare(u, delta, A, Bmat, Cmat,
                                    delta_bias, delta_softplus)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    def body(u_blk, dt_blk, B_blk, C_blk):
        # u/dt: (B, KC, L/n); B/C: (B, KC, N, L/n); all fp32 already
        a = jnp.exp(jnp.einsum("bdl,dn->bdln", dt_blk, A32))
        b = jnp.einsum("bdl,bdnl,bdl->bdln", dt_blk, B_blk, u_blk)
        _, h = jax.lax.associative_scan(combine, (a, b), axis=2)
        A_last = jnp.prod(a, axis=2)                  # (B, KC, N)
        B_last = h[:, :, -1, :]
        A_all = jax.lax.all_gather(A_last, axis_name)  # (n, B, KC, N)
        B_all = jax.lax.all_gather(B_last, axis_name)
        A_pre, B_pre = jax.lax.associative_scan(combine, (A_all, B_all),
                                                axis=0)
        idx = jax.lax.axis_index(axis_name)
        h_in = jax.lax.dynamic_index_in_dim(
            B_pre, jnp.maximum(idx - 1, 0), 0, keepdims=False)
        h_in = jnp.where(idx > 0, h_in, 0.0)          # (B, KC, N)
        # fold the incoming state into b_0 and rescan locally
        b = b.at[:, :, 0, :].add(a[:, :, 0, :] * h_in)
        _, h = jax.lax.associative_scan(combine, (a, b), axis=2)
        return jnp.einsum("bdln,bdnl->bdl", h, C_blk)

    y = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, axis_name), P(None, None, axis_name),
                  P(None, None, None, axis_name),
                  P(None, None, None, axis_name)),
        out_specs=P(None, None, axis_name), check_vma=False,
    )(u32, dt, Bx, Cx)
    return _finalize(y, u32, D)

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
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.selective_scan_pallas import linear_scan
from .mesh import DATA_AXIS


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

"""Mamba-2 SSD (state-space duality) chunked scan in pure jnp.

TPU replacement for the reference's Triton SSD stack (vmamba_src/mamba2/,
SURVEY.md §2.11): the chunked decomposition turns the recurrence into
attention-like intra-chunk matmuls (MXU) plus a short inter-chunk state
recurrence. Semantics follow the reference oracle ``ssd_minimal_discrete``
(mamba2/ssd_minimal.py:34-83):

    h_t = exp(dt_t * A_head) * h_{t-1} + dt_t * B_t^T x_t      (per head)
    y_t = C_t h_t + D * x_t

Shapes follow selective_scan_chunk_fn (mamba2/ssd_minimal.py:86-148):
    x (B, L, H, P); dt (B, L, H); A (H,); Bs/Cs (B, L, G, N) with the G
    groups broadcast over H//G heads; D (H, P) or None; dt_bias (H,).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _segsum(x):
    """Stable segment sum: out[..., i, j] = sum_{j < k <= i} x[..., k]
    (mamba2/ssd_minimal.py:22-31). x: (..., T)."""
    T = x.shape[-1]
    csum = jnp.cumsum(x, axis=-1)
    seg = csum[..., :, None] - csum[..., None, :]
    mask = jnp.tril(jnp.ones((T, T), bool), k=0)
    return jnp.where(mask, seg, -jnp.inf)


@partial(jax.jit, static_argnames=("chunk_size", "dt_softplus"))
def ssd_chunked(x, dt, A, Bs, Cs, D=None, dt_bias=None, chunk_size=64,
                dt_softplus=True, initial_states=None):
    """Chunked SSD scan. Returns (y (B, L, H, P), final_state (B, H, P, N)).

    All compute fp32 (the reference keeps fp32 states in its Triton kernels).
    """
    Bb, L, H, P = x.shape
    G = Bs.shape[2]
    N = Bs.shape[3]
    reps = H // G
    L_orig = L
    if L % chunk_size != 0:
        # causal padding at the end is inert: dt -> -inf gives softplus 0,
        # so decay exp(0)=1 and zero input contribution
        pad = chunk_size - L % chunk_size
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)), constant_values=-1e9)
        Bs = jnp.pad(Bs, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cs = jnp.pad(Cs, ((0, 0), (0, pad), (0, 0), (0, 0)))
        L = L + pad
    nc = L // chunk_size

    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    A_dt = dt * A.astype(jnp.float32)                    # (B, L, H)

    # broadcast groups to heads and reshape into chunks
    Bh = jnp.repeat(Bs.astype(jnp.float32), reps, axis=2)  # (B, L, H, N)
    Ch = jnp.repeat(Cs.astype(jnp.float32), reps, axis=2)

    xc = x.reshape(Bb, nc, chunk_size, H, P)
    dtc = dt.reshape(Bb, nc, chunk_size, H)
    Ac = A_dt.reshape(Bb, nc, chunk_size, H).transpose(0, 3, 1, 2)  # (B,H,nc,cs)
    Bc = Bh.reshape(Bb, nc, chunk_size, H, N)
    Cc = Ch.reshape(Bb, nc, chunk_size, H, N)

    A_cumsum = jnp.cumsum(Ac, axis=-1)                   # (B, H, nc, cs)

    # 1. intra-chunk (diagonal block) outputs
    Lmat = jnp.exp(_segsum(Ac))                          # (B, H, nc, cs, cs)
    Y_diag = jnp.einsum("bclhn,bcshn,bhcls,bcsh,bcshp->bclhp",
                        Cc, Bc, Lmat, dtc, xc)

    # 2. chunk-final intra-chunk states
    decay_states = jnp.exp(A_cumsum[..., -1:] - A_cumsum)  # (B, H, nc, cs)
    states = jnp.einsum("bclhn,bhcl,bclh,bclhp->bchpn",
                        Bc, decay_states, dtc, xc)         # (B,nc,H,P,N)

    # 3. inter-chunk recurrence over chunk states (short scan over nc)
    if initial_states is None:
        initial_states = jnp.zeros((Bb, 1, H, P, N), jnp.float32)
    states = jnp.concatenate([initial_states, states], axis=1)  # (B,nc+1,...)
    chunk_decay = A_cumsum[..., -1]                      # (B, H, nc)
    padded = jnp.pad(chunk_decay, ((0, 0), (0, 0), (1, 0)))
    decay_chunk = jnp.exp(_segsum(padded))               # (B, H, nc+1, nc+1)
    decay_chunk = jnp.where(jnp.isfinite(decay_chunk), decay_chunk, 0.0)
    new_states = jnp.einsum("bhzc,bchpn->bzhpn", decay_chunk, states)
    states, final_state = new_states[:, :-1], new_states[:, -1]

    # 4. state -> output conversion per chunk
    state_decay_out = jnp.exp(A_cumsum)                  # (B, H, nc, cs)
    Y_off = jnp.einsum("bclhn,bchpn,bhcl->bclhp", Cc, states, state_decay_out)

    y = (Y_diag + Y_off).reshape(Bb, L, H, P)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None] * x
    return y[:, :L_orig], final_state

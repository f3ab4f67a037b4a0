"""Mamba-2 SSD chunked scan parity vs the reference torch oracle
(mamba2/ssd_minimal.py ssd_minimal_discrete)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from xpoint_tpu.ops.ssd import ssd_chunked


def ref_ssd(x, dt, A, Bs, Cs, D, dt_bias, chunk_size):
    """Run the reference ssd_minimal_discrete (imported read-only)."""
    from reference_oracle import get_reference
    get_reference()
    from xpoint.models.vmamba_src.mamba2.ssd_minimal import (
        ssd_minimal_discrete)
    H = dt.shape[-1]
    G = Bs.shape[2]
    reps = H // G
    dtp = torch.nn.functional.softplus(torch.from_numpy(dt)
                                       + torch.from_numpy(dt_bias))
    xt = torch.from_numpy(x)
    Bt = torch.from_numpy(Bs).repeat_interleave(reps, dim=2)
    Ct = torch.from_numpy(Cs).repeat_interleave(reps, dim=2)
    y, final = ssd_minimal_discrete(xt * dtp.unsqueeze(-1),
                                    torch.from_numpy(A) * dtp,
                                    Bt, Ct, block_len=chunk_size)
    y = y + torch.from_numpy(D)[None, None] * xt
    return y.numpy(), final.numpy()


@pytest.mark.parametrize("L,cs", [(128, 64), (256, 32)])
def test_ssd_chunked_matches_reference(L, cs):
    rng = np.random.default_rng(0)
    Bb, H, P, G, N = 2, 4, 8, 2, 16
    x = rng.normal(size=(Bb, L, H, P)).astype(np.float32)
    dt = (0.5 * rng.uniform(size=(Bb, L, H))).astype(np.float32)
    A = (-0.5 * rng.uniform(size=(H,))).astype(np.float32)
    Bs = rng.normal(size=(Bb, L, G, N)).astype(np.float32)
    Cs = rng.normal(size=(Bb, L, G, N)).astype(np.float32)
    D = rng.normal(size=(H, P)).astype(np.float32)
    dt_bias = (0.5 * rng.uniform(size=(H,))).astype(np.float32)

    y_ref, final_ref = ref_ssd(x, dt, A, Bs, Cs, D, dt_bias, cs)
    y, final = ssd_chunked(jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A),
                           jnp.asarray(Bs), jnp.asarray(Cs), jnp.asarray(D),
                           jnp.asarray(dt_bias), chunk_size=cs)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(final), final_ref, atol=2e-3,
                               rtol=1e-2)

"""Selective-scan parity tests, modeled on the reference kernel test grid
(vmamba_src/kernels/selective_scan/test_selective_scan.py) with the torch
sequential recurrence as the oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.ops.selective_scan import (
    selective_scan, selective_scan_ref, selective_scan_assoc,
)
from xpoint_tpu.ops.cross_scan import cross_scan, cross_merge


def torch_oracle(u, delta, A, B, C, D, delta_bias, delta_softplus=True):
    """Port of reference selective_scan_torch (csms6s.py:25-68) in numpy."""
    Batch, K, N, L = B.shape
    KC = u.shape[1]
    Cdim = KC // K
    delta = delta.astype(np.float64)
    if delta_bias is not None:
        delta = delta + delta_bias[None, :, None]
    if delta_softplus:
        delta = np.log1p(np.exp(-np.abs(delta))) + np.maximum(delta, 0)
    u64 = u.astype(np.float64)
    Bx = np.repeat(B, Cdim, axis=1).astype(np.float64)
    Cx = np.repeat(C, Cdim, axis=1).astype(np.float64)
    A = A.astype(np.float64)

    deltaA = np.exp(np.einsum("bdl,dn->bdln", delta, A))
    deltaBu = np.einsum("bdl,bdnl,bdl->bdln", delta, Bx, u64)
    h = np.zeros((Batch, KC, N))
    ys = []
    for i in range(L):
        h = deltaA[:, :, i] * h + deltaBu[:, :, i]
        ys.append(np.einsum("bdn,bdn->bd", h, Cx[:, :, :, i]))
    y = np.stack(ys, axis=2)
    if D is not None:
        y = y + u64 * D[None, :, None]
    return y


def make_params(rng, Batch=2, K=4, Cdim=6, N=4, L=128):
    KC = K * Cdim
    u = rng.normal(size=(Batch, KC, L)).astype(np.float32)
    delta = (0.5 * rng.uniform(size=(Batch, KC, L))).astype(np.float32)
    A = (-0.5 * rng.uniform(size=(KC, N))).astype(np.float32)
    B = rng.normal(size=(Batch, K, N, L)).astype(np.float32)
    C = rng.normal(size=(Batch, K, N, L)).astype(np.float32)
    D = rng.normal(size=(KC,)).astype(np.float32)
    delta_bias = (0.5 * rng.uniform(size=(KC,))).astype(np.float32)
    return u, delta, A, B, C, D, delta_bias


@pytest.mark.parametrize("backend", ["ref", "assoc"])
@pytest.mark.parametrize("L", [64, 333])
@pytest.mark.parametrize("N", [1, 4])
def test_selective_scan_matches_oracle(backend, L, N):
    rng = np.random.default_rng(42)
    args = make_params(rng, N=N, L=L)
    ref = torch_oracle(*args)
    out = jax.jit(lambda *a: selective_scan(*a, backend=backend))(
        *[jnp.asarray(a) for a in args])
    # fp32 compute vs fp64 oracle: per-step rounding accumulates over L
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("with_D,with_bias,softplus", [
    (False, False, False), (True, False, True), (False, True, True),
])
def test_selective_scan_flags(with_D, with_bias, softplus):
    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, delta_bias = make_params(rng, L=96)
    D_ = D if with_D else None
    db_ = delta_bias if with_bias else None
    ref = torch_oracle(u, delta, A, B, C, D_, db_, softplus)
    out = jax.jit(
        lambda u_, dt_, A_, B_, C_: selective_scan_assoc(
            u_, dt_, A_, B_, C_,
            None if D_ is None else jnp.asarray(D_),
            None if db_ is None else jnp.asarray(db_), softplus))(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
        jnp.asarray(B), jnp.asarray(C))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)


def test_selective_scan_gradients_match_between_backends():
    rng = np.random.default_rng(3)
    args = [jnp.asarray(a) for a in make_params(rng, Batch=1, Cdim=2, N=2, L=64)]

    def loss(fn, u, delta, A, B, C, D, db):
        return jnp.sum(fn(u, delta, A, B, C, D, db, True) ** 2)

    # jit the grad programs: eager transposed-scan dispatch on the 1-core
    # CPU runner dominates; jitted programs hit the persistent cache
    g_ref = jax.jit(jax.grad(lambda *a: loss(selective_scan_ref, *a), argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    g_assoc = jax.jit(jax.grad(lambda *a: loss(selective_scan_assoc, *a), argnums=(0, 1, 2, 3, 4, 5, 6)))(*args)
    for gr, ga in zip(g_ref, g_assoc):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr),
                                   atol=1e-3, rtol=1e-3)


def test_cross_scan_matches_torch_reference():
    import torch
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)

    ours = np.asarray(cross_scan(jnp.asarray(x)))      # (B, 4, L, C)

    # reference cross_scan_fwd with in/out channel_first (csm_triton.py:22-29)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)       # (B, C, H, W)
    B, C, H, W = xt.shape
    y = xt.new_empty((B, 4, C, H * W))
    y[:, 0] = xt.flatten(2, 3)
    y[:, 1] = xt.transpose(2, 3).flatten(2, 3)
    y[:, 2:4] = torch.flip(y[:, 0:2], dims=[-1])
    ref = y.numpy()
    np.testing.assert_allclose(ours.transpose(0, 1, 3, 2), ref, atol=1e-6)


def test_cross_merge_inverts_cross_scan():
    import torch
    rng = np.random.default_rng(12)
    ys = rng.normal(size=(2, 4, 5 * 7, 3)).astype(np.float32)

    ours = np.asarray(cross_merge(jnp.asarray(ys), 5, 7))

    # reference cross_merge_fwd (csm_triton.py:56-62)
    yt = torch.from_numpy(ys).permute(0, 1, 3, 2).reshape(2, 4, 3, 5, 7)
    B, K, D, H, W = yt.shape
    yt = yt.view(B, K, D, -1)
    yt = yt[:, 0:2] + yt[:, 2:4].flip(dims=[-1]).view(B, 2, D, -1)
    yt = yt[:, 0] + yt[:, 1].view(B, -1, W, H).transpose(2, 3).contiguous().view(B, D, -1)
    ref = yt.view(B, D, H, W).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_cross_scan_merge_roundtrip_counts():
    # merging the scan of x returns 4x the contribution of each pixel
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 2)).astype(np.float32))
    merged = cross_merge(cross_scan(x), 4, 6)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(4 * x), atol=1e-5)


@pytest.mark.parametrize("L,N", [(64, 1), (333, 4), (1024, 1)])
def test_pallas_backend_matches_oracle(L, N):
    rng = np.random.default_rng(21)
    args = make_params(rng, N=N, L=L)
    ref = torch_oracle(*args)
    out = jax.jit(lambda *a: selective_scan(*a, backend="pallas"))(
        *[jnp.asarray(a) for a in args])
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)


def test_pallas_gradients_match_ref():
    from xpoint_tpu.ops.selective_scan import selective_scan_ref
    from xpoint_tpu.ops.selective_scan_pallas import selective_scan_pallas
    rng = np.random.default_rng(22)
    args = [jnp.asarray(a) for a in make_params(rng, Batch=1, Cdim=2, N=2, L=96)]

    def loss(fn, *a):
        return jnp.sum(fn(*a, True) ** 2)

    g_ref = jax.jit(jax.grad(lambda *a: loss(selective_scan_ref, *a),
                             argnums=tuple(range(7))))(*args)
    g_pal = jax.jit(jax.grad(lambda *a: loss(selective_scan_pallas, *a),
                             argnums=tuple(range(7))))(*args)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=2e-3, rtol=1e-2)


def test_fused_pallas_gradients_n1():
    """The fused N=1 path's custom VJP (gradient through the unfused
    composition) must match the sequential-reference gradients."""
    from xpoint_tpu.ops.selective_scan import selective_scan_ref
    from xpoint_tpu.ops.selective_scan_pallas import selective_scan_pallas
    rng = np.random.default_rng(31)
    args = [jnp.asarray(a) for a in make_params(rng, Batch=1, Cdim=4, N=1, L=128)]

    def loss(fn, *a):
        return jnp.sum(fn(*a, True) ** 2)

    g_ref = jax.jit(jax.grad(lambda *a: loss(selective_scan_ref, *a),
                             argnums=tuple(range(7))))(*args)
    g_fused = jax.jit(jax.grad(lambda *a: loss(selective_scan_pallas, *a),
                               argnums=tuple(range(7))))(*args)
    for gr, gf in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-3, rtol=1e-2)


def test_fused_bidir_matches_flip_reference():
    """Bidirectional kernel (mirrored-chunk suffix scan, no flips) must
    equal the flip-based composition, forward and backward."""
    from xpoint_tpu.ops.selective_scan_pallas import (
        selective_scan_fused_bidir, _unfused_bidir_ref)
    rng = np.random.default_rng(0)
    B, L, Dim = 2, 300, 24
    u2 = jnp.asarray(rng.normal(size=(B, 2, L, Dim)).astype(np.float32))
    dt4 = jnp.asarray(rng.normal(size=(B, 4, L, Dim)).astype(np.float32)) * .5
    bc4 = jnp.asarray(rng.normal(size=(B, 4, L, 1)).astype(np.float32))
    cc4 = jnp.asarray(rng.normal(size=(B, 4, L, 1)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(
        rng.normal(size=(4 * Dim,)).astype(np.float32)) * 0.3)
    D = jnp.asarray(rng.normal(size=(4 * Dim,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4 * Dim,)).astype(np.float32)) * 0.2

    y = jax.jit(selective_scan_fused_bidir)(u2, dt4, bc4, cc4, A, D, bias)
    yr = jax.jit(_unfused_bidir_ref)(u2, dt4, bc4, cc4, A, D, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-4, atol=1e-5)

    f = lambda *a: (selective_scan_fused_bidir(*a) ** 2).sum()
    fr = lambda *a: (_unfused_bidir_ref(*a) ** 2).sum()
    g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(u2, dt4, bc4, cc4, A, D, bias)
    gr = jax.jit(jax.grad(fr, argnums=(0, 1, 2, 3)))(u2, dt4, bc4, cc4, A, D, bias)
    for gi, gri in zip(g, gr):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gri),
                                   rtol=1e-4, atol=1e-5)


def test_fused_bidir_tok_matches_standard_layout():
    """Token-major variant (operands in the kernel's (L, M) lane order —
    no standalone relayouts) must equal selective_scan_fused_bidir under
    the layout mapping, forward and backward."""
    from xpoint_tpu.ops.selective_scan_pallas import (
        selective_scan_fused_bidir, selective_scan_fused_bidir_tok)
    rng = np.random.default_rng(3)
    B, L, Dim = 2, 300, 24
    u2 = jnp.asarray(rng.normal(size=(B, 2, L, Dim)).astype(np.float32))
    dt4 = jnp.asarray(rng.normal(size=(B, 4, L, Dim)).astype(np.float32)) * .5
    bc4 = jnp.asarray(rng.normal(size=(B, 4, L, 1)).astype(np.float32))
    cc4 = jnp.asarray(rng.normal(size=(B, 4, L, 1)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(
        rng.normal(size=(4 * Dim,)).astype(np.float32)) * 0.3)
    D = jnp.asarray(rng.normal(size=(4 * Dim,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4 * Dim,)).astype(np.float32)) * 0.2

    # layout mapping: k = 2r + j; tok tensors are (r-major,) L-major, b, j
    u_t = u2.transpose(2, 0, 1, 3)                        # (L, B, 2, Dim)
    dt_t = jnp.stack([dt4[:, 0:2].transpose(2, 0, 1, 3),
                      dt4[:, 2:4].transpose(2, 0, 1, 3)])
    bc_t = jnp.stack([bc4[:, 0:2, :, 0].transpose(2, 0, 1),
                      bc4[:, 2:4, :, 0].transpose(2, 0, 1)])
    cc_t = jnp.stack([cc4[:, 0:2, :, 0].transpose(2, 0, 1),
                      cc4[:, 2:4, :, 0].transpose(2, 0, 1)])

    y4 = jax.jit(selective_scan_fused_bidir)(u2, dt4, bc4, cc4, A, D, bias)
    y_f, y_r = jax.jit(selective_scan_fused_bidir_tok)(u_t, dt_t, bc_t, cc_t,
                                                       A, D, bias)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y4[:, 0:2].transpose(2, 0, 1, 3)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(y_r), np.asarray(y4[:, 2:4].transpose(2, 0, 1, 3)),
        rtol=1e-4, atol=1e-5)

    # grads: same scalar loss through both layouts
    def f_std(u2, dt4, bc4, cc4, A, D, bias):
        y = selective_scan_fused_bidir(u2, dt4, bc4, cc4, A, D, bias)
        return (y ** 2).sum()

    def f_tok(u2, dt4, bc4, cc4, A, D, bias):
        yf, yr = selective_scan_fused_bidir_tok(
            u2.transpose(2, 0, 1, 3),
            jnp.stack([dt4[:, 0:2].transpose(2, 0, 1, 3),
                       dt4[:, 2:4].transpose(2, 0, 1, 3)]),
            jnp.stack([bc4[:, 0:2, :, 0].transpose(2, 0, 1),
                       bc4[:, 2:4, :, 0].transpose(2, 0, 1)]),
            jnp.stack([cc4[:, 0:2, :, 0].transpose(2, 0, 1),
                       cc4[:, 2:4, :, 0].transpose(2, 0, 1)]),
            A, D, bias)
        return (yf ** 2).sum() + (yr ** 2).sum()

    args = (u2, dt4, bc4, cc4, A, D, bias)
    g_std = jax.jit(jax.grad(f_std, argnums=tuple(range(7))))(*args)
    g_tok = jax.jit(jax.grad(f_tok, argnums=tuple(range(7))))(*args)
    for gs, gt in zip(g_std, g_tok):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5)


def test_ss2d_bidir_path_matches_ref_backend():
    """SS2D cross2d + N=1 + pallas dispatches to the flip-free bidirectional
    path; output and parameter gradients must match the ref backend."""
    from xpoint_tpu.models.vssm import SS2D
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 10, 32)).astype(np.float32))
    kw = dict(d_model=32, d_state=1, ssm_ratio=1.0, dt_rank="auto",
              d_conv=3, disable_z=True, scan_mode=0)
    m_ref = SS2D(**kw, scan_backend="ref")
    m_pal = SS2D(**kw, scan_backend="pallas")
    v = jax.jit(m_ref.init)(jax.random.PRNGKey(0), x)
    y_ref = jax.jit(m_ref.apply)(v, x)
    y_pal = jax.jit(m_pal.apply)(v, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)

    g_ref = jax.jit(jax.grad(lambda p: (m_ref.apply(p, x) ** 2).sum()))(v)
    g_pal = jax.jit(jax.grad(lambda p: (m_pal.apply(p, x) ** 2).sum()))(v)

    def cmp(a, b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)
    jax.tree.map(cmp, g_ref, g_pal)

"""Sequence-parallel scan (parallel/ring_scan.py) vs the single-device
kernel on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from xpoint_tpu.parallel import make_mesh, ring_linear_scan
from xpoint_tpu.ops.selective_scan_pallas import linear_scan


def _data(L, M, seed=0):
    rng = np.random.default_rng(seed)
    # decay factors in (0, 1) like exp(dt*A) plus some sign variety
    a = jnp.asarray(rng.uniform(0.2, 0.99, size=(L, M)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(L, M)).astype(np.float32))
    return a, b


def test_ring_scan_matches_single_device():
    # jit both programs: eager shard_map/scan dispatch on the 1-core CPU
    # runner dominates; jitted programs hit the persistent cache
    mesh = make_mesh(8)
    a, b = _data(512, 24)
    with mesh:
        h = jax.jit(lambda a_, b_: ring_linear_scan(a_, b_, mesh))(a, b)
    h_ref = jax.jit(linear_scan)(a, b)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_scan_gradients():
    mesh = make_mesh(8)
    a, b = _data(256, 8, seed=1)

    @jax.jit
    def loss_ring(a, b):
        return (ring_linear_scan(a, b, mesh) ** 2).sum()

    def loss_ref(a, b):
        return (linear_scan(a, b) ** 2).sum()

    ga = jax.jit(jax.grad(loss_ring, argnums=(0, 1)))(a, b)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(a, b)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_ring_scan_long_decay_parity():
    """Long sequence with strong decay: the cross-shard state handoff must
    reproduce the sequential recurrence exactly at shard boundaries."""
    mesh = make_mesh(8)
    a, b = _data(2048, 4, seed=2)
    with mesh:
        h = jax.jit(lambda a_, b_: ring_linear_scan(a_, b_, mesh))(a, b)
    # boundary rows: first row of each shard depends on the carry
    h = np.asarray(h)
    h_ref = np.asarray(jax.jit(linear_scan)(a, b))
    for s in range(8):
        i = s * 256
        np.testing.assert_allclose(h[i], h_ref[i], rtol=1e-5, atol=1e-5)


def test_ring_selective_scan_matches_assoc():
    """backend='ring' (L sharded over the mesh) vs the single-device assoc
    backend — the full S6 argument layout (SURVEY §2.9), K groups, N>1."""
    from xpoint_tpu.ops.selective_scan import selective_scan
    from xpoint_tpu.parallel.ring_scan import ring_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    B, K, C, N, L = 2, 4, 6, 2, 256
    KC = K * C
    u = jnp.asarray(rng.normal(size=(B, KC, L)).astype(np.float32))
    dt = jnp.asarray(rng.normal(size=(B, KC, L)).astype(np.float32))
    A = jnp.asarray(-np.exp(rng.normal(size=(KC, N))).astype(np.float32))
    Bm = jnp.asarray(rng.normal(size=(B, K, N, L)).astype(np.float32))
    Cm = jnp.asarray(rng.normal(size=(B, K, N, L)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(KC,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(KC,)).astype(np.float32) * 0.1)

    y_ref = jax.jit(lambda *a: selective_scan(*a, backend="assoc"))(
        u, dt, A, Bm, Cm, D, bias)
    with mesh, ring_mesh(mesh):
        y_ring = jax.jit(lambda *a: selective_scan(*a, backend="ring"))(
            u, dt, A, Bm, Cm, D, bias)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_ss2d_ring_backend_matches_assoc():
    """A full SS2D block built with scan_backend='ring' on the 8-device
    mesh reproduces the single-device assoc forward — i.e. ≥1-chip images
    can actually run L-sharded through the model (VSSM wiring)."""
    from xpoint_tpu.models.vssm import SS2D
    from xpoint_tpu.parallel.ring_scan import ring_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(4)
    B, H, W, Dm = 1, 16, 16, 8
    x = jnp.asarray(rng.normal(size=(B, H, W, Dm)).astype(np.float32))

    mod_a = SS2D(d_model=Dm, d_state=1, scan_backend="assoc")
    variables = mod_a.init(jax.random.PRNGKey(0), x)
    y_ref = jax.jit(mod_a.apply)(variables, x)

    mod_r = SS2D(d_model=Dm, d_state=1, scan_backend="ring")
    with mesh, ring_mesh(mesh):
        y_ring = jax.jit(mod_r.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

"""Golden parity of the tiled two-pass affine warp (ops/warp_tiled.py)
against the exact gather warp (ops/warp.py) over the reference's sampled
homography family (homographies.py sample_homography defaults used by
homographic adaptation, incl. max_angle=pi rotations and perspective)."""
import numpy as np
import jax.numpy as jnp
import pytest

from xpoint_tpu.ops.warp import warp_image_multi
from xpoint_tpu.ops.warp_tiled import warp_image_multi_tiled
from xpoint_tpu.geometry.homography import sample_homography


HA_SAMPLER = dict(translation=True, rotation=True, scaling=True,
                  perspective=True, scaling_amplitude=0.15,
                  perspective_amplitude_x=0.15, perspective_amplitude_y=0.15,
                  patch_ratio=0.9, max_angle=np.pi, allow_artifacts=True)


def _smooth_image(H, W, B=2):
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.float32)
    img = img[None, :, :, None]
    return np.concatenate([img] * B, axis=0)


def test_simple_transforms_match_exactly():
    """Axis-aligned maps (no shear) have NO two-pass approximation term:
    identity / translation / scale must be bit-close to the gather warp."""
    img = _smooth_image(64, 64, B=1)
    Hs = np.stack([
        np.eye(3, dtype=np.float32),
        np.array([[1, 0, 3.7], [0, 1, -2.2], [0, 0, 1]], np.float32),
        np.diag([0.9, 0.9, 1.0]).astype(np.float32),
    ])
    ref = np.asarray(warp_image_multi(jnp.asarray(img), jnp.asarray(Hs),
                                      "bilinear", "zeros"))
    new = np.asarray(warp_image_multi_tiled(jnp.asarray(img), jnp.asarray(Hs),
                                            "bilinear", "zeros"))
    np.testing.assert_allclose(new, ref, atol=2e-5)


def test_near_90_degree_rotation():
    """max_angle=pi rotations hit the Catmull-Smith bottleneck; the
    rotated-source branch must keep them accurate."""
    img = _smooth_image(64, 64, B=1)
    th = np.pi / 2 - 0.05
    Hm = np.array([[np.cos(th), -np.sin(th), 60],
                   [np.sin(th), np.cos(th), 2], [0, 0, 1]], np.float32)
    ref = np.asarray(warp_image_multi(jnp.asarray(img), jnp.asarray(Hm)[None],
                                      "bilinear", "zeros"))
    new = np.asarray(warp_image_multi_tiled(jnp.asarray(img),
                                            jnp.asarray(Hm)[None],
                                            "bilinear", "zeros"))
    assert np.abs(ref - new).max() < 5e-3


@pytest.mark.parametrize("pmode", ["zeros", "reflection"])
def test_sampled_homography_family(pmode):
    """Statistical parity over the HA sampler, evaluated where HA actually
    consumes the warp — inside each homography's valid mask (outside it,
    extreme warps sample near their horizon line, where the reference's
    multi-fold reflection of divergent coordinates is meaningless content
    that homographic adaptation zero-counts anyway)."""
    from xpoint_tpu.geometry.homography import compute_valid_mask
    rng = np.random.default_rng(0)
    H = W = 128
    img = _smooth_image(H, W)
    Hs = np.stack([sample_homography(np.array([H, W]), rng=rng, **HA_SAMPLER)
                   for _ in range(8)]).astype(np.float32)
    masks = np.stack([compute_valid_mask((H, W), Hm, erosion_radius=3)
                      for Hm in Hs]).astype(np.float32)   # (n, H, W)
    ref = np.asarray(warp_image_multi(jnp.asarray(img), jnp.asarray(Hs),
                                      "bilinear", pmode))
    new = np.asarray(warp_image_multi_tiled(jnp.asarray(img), jnp.asarray(Hs),
                                            "bilinear", pmode))
    m = masks[:, None, :, :, None]
    err = np.abs(ref - new) * m
    denom = m.sum() * err.shape[1] * err.shape[4] / (m.shape[1] * m.shape[4])
    assert err.sum() / max(denom, 1) < 2e-3, err.sum() / denom
    assert err.max() < 0.2, err.max()


@pytest.mark.skipif(__import__("jax").default_backend() != "tpu",
                    reason="Pallas warp kernel only compiles on TPU; the CI "
                           "suite (CPU-forced conftest) exercises the XLA "
                           "fallback — run this on-device (verify skill)")
def test_pallas_kernel_matches_xla_fallback_on_device():
    """The shipped hot path (_warp_one_pallas) vs the XLA fallback
    (_warp_one with the backend gate forced off) on identical inputs —
    the on-device golden coverage the repo's device-op convention
    requires."""
    from xpoint_tpu.ops import warp_tiled as wt
    rng = np.random.default_rng(2)
    H = W = 128
    img = _smooth_image(H, W)
    Hs = np.stack([sample_homography(np.array([H, W]), rng=rng, **HA_SAMPLER)
                   for _ in range(4)]).astype(np.float32)
    with_pallas = np.asarray(warp_image_multi_tiled(
        jnp.asarray(img), jnp.asarray(Hs), "bilinear", "reflection"))

    # force the XLA fallback branch: the backend gate is evaluated at trace
    # time, so clear the jit cache and retrace with the gate mocked off
    import unittest.mock as mock
    warp_image_multi_tiled.clear_cache()
    try:
        with mock.patch.object(wt._warp_one.__globals__["jax"],
                               "default_backend", lambda: "cpu"):
            without = np.asarray(warp_image_multi_tiled(
                jnp.asarray(img), jnp.asarray(Hs), "bilinear", "reflection"))
    finally:
        warp_image_multi_tiled.clear_cache()
    np.testing.assert_allclose(with_pallas, without, atol=1e-4)


def test_nearest_mask_parity():
    """Valid-mask (blob) unwarp in nearest mode: boundary rounding may
    differ on isolated edge pixels only."""
    rng = np.random.default_rng(1)
    H = W = 128
    mask = np.zeros((1, H, W, 1), np.float32)
    mask[0, 10:110, 15:100, 0] = 1
    Hs = np.stack([sample_homography(np.array([H, W]), rng=rng, **HA_SAMPLER)
                   for _ in range(8)]).astype(np.float32)
    ref = np.asarray(warp_image_multi(jnp.asarray(mask), jnp.asarray(Hs),
                                      "nearest", "zeros"))
    new = np.asarray(warp_image_multi_tiled(jnp.asarray(mask), jnp.asarray(Hs),
                                            "nearest", "zeros"))
    assert (ref != new).mean() < 5e-3

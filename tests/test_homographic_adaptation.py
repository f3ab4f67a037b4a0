"""Homographic-adaptation parity tests (search_window vs torch unfold
oracle; count-weighted aggregation invariants)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.selfsup import (homographic_adaptation_multispectral,
                                search_window)


def torch_search_window(p1, p2, window_size, weighted):
    """Reference search_window (homographies.py:203-229)."""
    import torch
    t1 = torch.from_numpy(p1).unsqueeze(1)
    t2 = torch.from_numpy(p2).unsqueeze(1)
    pad = torch.nn.ZeroPad2d((window_size - 1) // 2)

    def unfolded(t):
        return pad(t).unfold(2, window_size, 1).unfold(3, window_size, 1)

    f1 = torch.sum(unfolded(t2), dim=[4, 5]) * t1
    f2 = torch.sum(unfolded(t1), dim=[4, 5]) * t2
    if not weighted:
        f1[f1 > 0] = 1
        f2[f2 > 0] = 1
    return f1[:, 0].numpy(), f2[:, 0].numpy()


@pytest.mark.parametrize("weighted", [True, False])
def test_search_window_matches_torch(weighted):
    rng = np.random.default_rng(0)
    p1 = (rng.uniform(size=(2, 16, 16)) > 0.9).astype(np.float32) * \
        rng.uniform(size=(2, 16, 16)).astype(np.float32)
    p2 = (rng.uniform(size=(2, 16, 16)) > 0.9).astype(np.float32) * \
        rng.uniform(size=(2, 16, 16)).astype(np.float32)
    ours1, ours2 = search_window(jnp.asarray(p1), jnp.asarray(p2), 5, weighted)
    ref1, ref2 = torch_search_window(p1, p2, 5, weighted)
    np.testing.assert_allclose(np.asarray(ours1), ref1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours2), ref2, atol=1e-5)


def test_ha_prod_constant_prob_invariant():
    """With a warp-invariant detector (constant prob), HA must return
    sqrt(c_o * c_t) wherever count >= min_count."""
    H = W = 48
    img_o = jnp.ones((1, H, W, 1)) * 0.3
    img_t = jnp.ones((1, H, W, 1)) * 0.7

    def prob_fn(img, is_optical):
        return jnp.full(img.shape[:3], 0.4 if is_optical else 0.9)

    out = homographic_adaptation_multispectral(
        img_o, img_t, prob_fn,
        {'num': 5, 'aggregation': 'prod', 'min_count': 2,
         'erosion_radius': 2},
        rng=np.random.default_rng(3))
    prob = np.asarray(out['prob'])
    center = prob[0, H // 4:-H // 4, W // 4:-W // 4]
    expected = np.sqrt(0.4 * 0.9)
    # center pixels are covered by most warps; value must be the constant
    nz = center[center > 0]
    assert len(nz) > 0
    np.testing.assert_allclose(nz, expected, atol=0.02)


def test_ha_sum_and_min_count_zeroing():
    H = W = 32
    img = jnp.ones((1, H, W, 1)) * 0.5

    def prob_fn(img, is_optical):
        return jnp.full(img.shape[:3], 0.5)

    out = homographic_adaptation_multispectral(
        img, img, prob_fn,
        {'num': 2, 'aggregation': 'sum', 'min_count': 3, 'erosion_radius': 0},
        rng=np.random.default_rng(4))
    prob = np.asarray(out['prob'])
    # max count = 2 (<3) everywhere -> fully zeroed
    assert (prob == 0).all()


def test_ha_window_mode_outputs_two_maps():
    H = W = 32
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(size=(1, H, W, 1)).astype(np.float32))

    def prob_fn(img, is_optical):
        p = jnp.zeros(img.shape[:3])
        return p.at[:, 8, 8].set(0.9).at[:, 20, 12].set(0.7)

    out = homographic_adaptation_multispectral(
        img, img, prob_fn,
        {'num': 3, 'aggregation': 'window', 'window_size': 5,
         'weighted_window': True, 'min_count': 1, 'erosion_radius': 0},
        rng=np.random.default_rng(6))
    assert out['prob'] is None
    po = np.asarray(out['prob_optical'])
    pt = np.asarray(out['prob_thermal'])
    assert po.shape == (1, H, W) and pt.shape == (1, H, W)
    assert po[0, 8, 8] > 0          # co-located detections survive


def test_sharded_ha_matches_single_device_exactly():
    """make_sharded_ha_fn over the virtual 8-device mesh must produce
    BIT-identical per-sample outputs to the unsharded program (the HA
    computation is per-sample independent; sharding is pure DataParallel,
    reference homographies.py:95-98)."""
    from xpoint_tpu.parallel import make_mesh
    from xpoint_tpu.selfsup.homographic_adaptation import (
        make_ha_fn, make_sharded_ha_fn, sample_ha_homographies)

    H = W = 32
    B = 8
    rng = np.random.default_rng(7)
    img_o = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
    img_t = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))

    # a sample-dependent "detector" so every shard computes distinct maps
    def prob_fn(img, is_optical):
        base = jnp.squeeze(img, -1)
        return base * (0.5 if is_optical else 0.8)

    cfg = {'num': 4, 'aggregation': 'prod', 'min_count': 1,
           'erosion_radius': 2}
    Hs, _ = sample_ha_homographies(
        dict(cfg, homographies={}), (H, W), np.random.default_rng(5),
        with_masks=False)

    run_single, _ = make_ha_fn(prob_fn, cfg)
    ref = run_single(img_o, img_t, jnp.asarray(Hs))

    mesh = make_mesh(8)
    run_sharded, _ = make_sharded_ha_fn(lambda v: prob_fn, cfg, mesh)
    out = run_sharded({}, img_o, img_t, jnp.asarray(Hs))

    np.testing.assert_array_equal(np.asarray(out['prob']),
                                  np.asarray(ref['prob']))

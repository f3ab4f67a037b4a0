"""Inference configuration paths: matcher dispatch, disable_hmhead,
model_override loading."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.models import build_xpoint
from xpoint_tpu.eval.infer import XPointInference


def _tiny_infer(matching_cfg):
    module, _ = build_xpoint({
        'multispectral': False, 'takes_pair': True, 'channel_version': 2,
        'descriptor_size': 16,
        'homography_regression_head': {'check': False}})
    img = jnp.zeros((1, 32, 32, 1))
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    return XPointInference(module, variables,
                           {'nms': 4, 'detection_threshold': 1e-4,
                            'matching': matching_cfg}, max_kp=64)


def _descs(n1=10, n2=12, d=16, seed=0):
    rng = np.random.default_rng(seed)
    d1 = rng.normal(size=(n1, d)).astype(np.float32)
    d2 = rng.normal(size=(n2, d)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return d1, d2


def test_bfmatcher_crosscheck_dispatch():
    infer = _tiny_infer({'method': 'bfmatcher',
                         'method_kwargs': {'crossCheck': True},
                         'knn_matches': False})
    d1, d2 = _descs()
    matches = infer.match(d1, d2)
    # mutual NN: each train index used at most once
    train_idx = [t for _, t, _ in matches]
    assert len(train_idx) == len(set(train_idx))


def test_knn_lowe_dispatch():
    infer = _tiny_infer({'method': 'bfmatcher', 'knn_matches': True})
    d1, d2 = _descs(seed=1)
    matches = infer.match(d1, d2)
    dmat = np.sqrt(np.maximum(2 - 2 * np.clip(d1 @ d2.T, -1, 1), 0))
    order = np.argsort(dmat, 1)
    expect = dmat[np.arange(10), order[:, 0]] < \
        0.9 * dmat[np.arange(10), order[:, 1]]
    assert len(matches) == int(expect.sum())


def test_thresholdmatcher_dispatch():
    infer = _tiny_infer({'method': 'thresholdmatcher',
                         'method_kwargs': {'threshold': 1.2}})
    d1, d2 = _descs(seed=2)
    matches = infer.match(d1, d2)
    dmat = np.sqrt(np.maximum(2 - 2 * np.clip(d1 @ d2.T, -1, 1), 0))
    assert len(matches) == int((dmat < 1.2).sum())


def test_nnmatcher_dispatch():
    infer = _tiny_infer({'method': 'nnmatcher',
                         'method_kwargs': {'threshold': 0.9}})
    d1, d2 = _descs(seed=3)
    matches = infer.match(d1, d2)
    for q, t, dist in matches:
        assert dist < 0.9


def test_flann_dispatch_is_plain_nn():
    """'flann' (reference: cv2 FlannBasedMatcher = approximate NN, no
    cross-check, matching.py:10-19) dispatches to exact NN without
    cross-check: every query keypoint gets its nearest target."""
    infer = _tiny_infer({'method': 'flann'})
    d1, d2 = _descs(seed=4)
    matches = infer.match(d1, d2)
    assert len(matches) == d1.shape[0]
    dmat = np.sqrt(np.maximum(2 - 2 * np.clip(d1 @ d2.T, -1, 1), 0))
    for q, t, dist in matches:
        assert t == int(dmat[q].argmin())


def test_keypoint_capacity_grows_past_max_kp():
    """More keypoints than max_kp must GROW the device capacity (one jit
    recompile), never silently truncate the metric path."""
    infer = _tiny_infer({'method': 'bfmatcher',
                         'method_kwargs': {'crossCheck': True}})
    infer.max_kp = 8
    rng = np.random.default_rng(5)
    n = 21                                  # > 2x capacity: two growths
    kps = np.stack([rng.integers(0, 32, n), rng.integers(0, 32, n)],
                   axis=1).astype(np.float32)
    desc_map = rng.normal(size=(4, 4, 16)).astype(np.float32)
    with pytest.warns(UserWarning, match="growing device capacity"):
        d = infer.descriptors_at(kps, desc_map, (32, 32))
    assert d.shape == (n, 16)
    assert infer.max_kp == 32
    # rows must equal the small-capacity result (padding never leaks in)
    d_direct = infer.descriptors_at(kps[:4], desc_map, (32, 32))
    np.testing.assert_allclose(d[:4], d_direct, atol=1e-6)
    # matching with n > original max_kp works and stays exact
    d1, d2 = _descs(40, 50, seed=6)
    infer.max_kp = 8
    matches = infer.match(d1, d2)
    dmat = np.sqrt(np.maximum(2 - 2 * np.clip(d1 @ d2.T, -1, 1), 0))
    for q, t, dist in matches:
        assert t == int(dmat[q].argmin())
        assert q == int(dmat[:, t].argmin())


def test_disable_hmhead_model_override(tmp_path):
    """load_model(model_override=...) rebuilds without the hm head."""
    from xpoint_tpu.config import save_yaml
    from xpoint_tpu.model_io import load_model
    from xpoint_tpu import checkpoints as ckpt
    from xpoint_tpu.parallel import TrainState
    import optax

    cfg = {'type': 'XPoint', 'multispectral': False, 'takes_pair': True,
           'channel_version': 2, 'descriptor_size': 16,
           'homography_regression_head': {'check': True, 'type': 'RegNet'}}
    module, mcfg = build_xpoint(cfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                            method=module.init_all)
    save_yaml({'model': mcfg}, str(tmp_path / 'params.yaml'))
    state = TrainState.create(variables['params'],
                              variables.get('batch_stats'), optax.adam(1e-3))
    ckpt.save(str(tmp_path), state, 'latest', 1)

    m2, v2, c2 = load_model(str(tmp_path), 'latest',
                            model_override={'homography_regression_head':
                                            {'check': False}})
    assert m2.hm_head == ""
    # forward works even though the checkpoint contains hm params
    out = m2.apply(v2, jnp.zeros((1, 32, 32, 1)), "optical")
    assert out['logits'].shape == (1, 4, 4, 65)


def test_subpixel_refinement_op():
    """Quadratic-peak refinement recovers a synthetic gaussian's subpixel
    center to ~0.05 px; padding rows pass through; flat regions refine to
    offset 0; border keypoints stay finite and within +-0.5."""
    from xpoint_tpu.ops.detector import refine_keypoints_subpixel

    H = W = 33
    cy, cx = 16.3, 15.6          # true subpixel peak
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing='ij')
    prob = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * 1.5 ** 2))

    kps = np.zeros((4, 2), np.int32)
    kps[0] = np.unravel_index(np.argmax(prob), prob.shape)   # int peak
    kps[1] = (0, 0)                                          # border
    kps[2] = (30, 3)                                         # flat-ish tail
    valid = np.array([True, True, True, False])
    out = np.asarray(refine_keypoints_subpixel(
        jnp.asarray(prob, jnp.float32), jnp.asarray(kps), jnp.asarray(valid)))

    # gaussian peak: refined lands much closer than the integer grid
    err_int = np.linalg.norm(kps[0] - np.array([cy, cx]))
    err_ref = np.linalg.norm(out[0] - np.array([cy, cx]))
    assert err_ref < 0.08 and err_ref < err_int / 4
    # offsets bounded by half a pixel everywhere
    assert np.all(np.abs(out[:3] - kps[:3]) <= 0.5 + 1e-6)
    # border keypoints stay ON the integer grid (the clipped neighbor
    # duplicates the center, degenerating the parabola to a constant
    # -0.5 shift out of the image)
    np.testing.assert_array_equal(out[1], kps[1].astype(np.float32))
    # padding row untouched
    np.testing.assert_array_equal(out[3], kps[3].astype(np.float32))


def test_subpixel_refinement_true_border_peak_stays_in_image():
    """A genuine maximum on the image edge must refine to itself along the
    border axis (never to a coordinate outside the image) while the
    in-image axis still refines."""
    from xpoint_tpu.ops.detector import refine_keypoints_subpixel

    prob = np.zeros((16, 16), np.float32)
    prob[0, 8] = 1.0
    prob[1, 8] = 0.4            # decaying into the image
    prob[0, 7] = 0.3
    prob[0, 9] = 0.5            # x-asymmetry: dx should move toward col 9
    kps = np.array([[0, 8], [15, 0]], np.int32)
    valid = np.array([True, True])
    out = np.asarray(refine_keypoints_subpixel(
        jnp.asarray(prob), jnp.asarray(kps), jnp.asarray(valid)))
    assert out[0, 0] == 0.0                 # row pinned at the border
    assert 8.0 < out[0, 1] <= 8.5           # col refines toward 9
    np.testing.assert_array_equal(out[1], [15.0, 0.0])  # corner pinned
    assert np.all(out[:, 0] >= 0) and np.all(out[:, 1] >= 0)


def test_keypoints_from_prob_subpixel_path():
    """Config-gated: default returns integer argwhere rows (reference
    parity); subpixel:true + prob_raw returns refined float coords with
    the SAME count and ordering."""
    module, _ = build_xpoint({
        'multispectral': False, 'takes_pair': True, 'channel_version': 2,
        'descriptor_size': 16,
        'homography_regression_head': {'check': False}})
    img = jnp.zeros((1, 32, 32, 1))
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    rng = np.random.default_rng(7)
    raw = rng.uniform(size=(32, 32)).astype(np.float32)
    nms = np.where(raw > 0.97, raw, 0.0)      # sparse "post-NMS" map

    base = XPointInference(module, variables,
                           {'detection_threshold': 0.5}, max_kp=64)
    kp_int = base.keypoints_from_prob(nms)
    assert kp_int.dtype.kind == 'i'

    sub = XPointInference(module, variables,
                          {'detection_threshold': 0.5, 'subpixel': True},
                          max_kp=64)
    kp_sub = sub.keypoints_from_prob(nms, prob_raw=raw)
    assert kp_sub.dtype == np.float32
    assert kp_sub.shape == kp_int.shape
    assert np.all(np.abs(kp_sub - kp_int) <= 0.5 + 1e-6)
    # without prob_raw the subpixel config degrades to reference semantics
    np.testing.assert_array_equal(sub.keypoints_from_prob(nms), kp_int)

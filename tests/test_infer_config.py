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

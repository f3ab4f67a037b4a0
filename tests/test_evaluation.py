"""End-to-end evaluation tests: metric math on synthetic cases + the full
infer->metrics loop on a tiny model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.eval.metrics import (
    compute_mAP, pr_from_tp, compute_tp_fp_dist, repeatability_sample,
    homography_corner_error, estimate_homography, descriptor_metrics_sample,
    aggregate_descriptor_metrics)


def test_repeatability_identity_perfect():
    kp = np.array([[5, 5], [10, 20], [30, 7]])
    eye = np.eye(3)
    r = repeatability_sample(kp, kp, eye, eye, (64, 64), distance_thresh=3)
    assert r == 1.0


def test_repeatability_disjoint_zero():
    kp1 = np.array([[5, 5]])
    kp2 = np.array([[40, 40]])
    r = repeatability_sample(kp1, kp2, np.eye(3), np.eye(3), (64, 64), 3)
    assert r == 0.0


def test_repeatability_with_warp():
    """Keypoints consistent under a known translation homography."""
    kp_o = np.array([[10, 10], [20, 30]])
    H_t = np.array([[1, 0, 5], [0, 1, 0], [0, 0, 1]], float)  # x+=5 (col)
    kp_t = kp_o + np.array([[0, 5]])     # thermal frame is warped by H_t
    r = repeatability_sample(kp_o, kp_t, np.eye(3), H_t, (64, 64), 1)
    assert r == 1.0


def test_tp_fp_dist_greedy():
    prob = np.zeros((32, 32), np.float32)
    prob[5, 5] = 0.9      # TP
    prob[5, 6] = 0.8      # duplicate of same GT -> FP
    prob[20, 20] = 0.7    # FP (no GT)
    kp_map = np.zeros((32, 32), bool)
    kp_map[5, 5] = True
    tp, fp, scores, n_gt, dist = compute_tp_fp_dist(prob, kp_map)
    assert n_gt == 1
    np.testing.assert_array_equal(tp, [True, False, False])


def test_map_perfect_is_one():
    precision, recall = pr_from_tp(np.array([True, True, True]), 3)
    assert compute_mAP(precision, recall) == pytest.approx(1.0)


def test_homography_estimation_and_corner_error():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.02, 0.01, 3.0], [-0.02, 0.98, -2.0],
                       [1e-5, -1e-5, 1.0]])
    pts = rng.uniform(10, 200, size=(50, 2)).astype(np.float32)  # (x, y)
    ones = np.ones((50, 1))
    w = (H_true @ np.concatenate([pts, ones], 1).T).T
    pts2 = (w[:, :2] / w[:, 2:]).astype(np.float32)
    H_est, _ = estimate_homography(pts, pts2, reprojection_threshold=3)
    err = homography_corner_error(H_est, H_true, (256, 256))
    assert err < 0.5
    assert homography_corner_error(None, H_true, (256, 256)) == 999.0


def test_descriptor_metrics_sample_perfect_matches():
    """Identity pair with identical keypoints + orthogonal descriptors:
    all matches correct, m-score 1, nn_map 1."""
    kp = np.array([[8, 8], [16, 24], [40, 40], [50, 12]])
    desc = np.eye(4, 16, dtype=np.float32)
    matches = [(i, i, 0.0) for i in range(4)]
    s = descriptor_metrics_sample(kp, desc, kp, desc, np.eye(3), np.eye(3),
                                  (64, 64), 3, matches, matches, matches)
    assert s['n_gt_optical'] == 4 and s['m_score_optical'] == 1.0
    agg = aggregate_descriptor_metrics([s], threshold_warp=3)
    assert agg['nn_map'] == pytest.approx(1.0)
    assert agg['m_score'] == pytest.approx(1.0)
    assert agg['h_correctness'] == 1.0   # identity recovered by MAGSAC


def test_full_eval_loop_tiny_model():
    """Drive the full infer->repeatability/descriptor loop with a tiny CNN
    XPoint on random pairs (smoke: finite outputs, correct shapes)."""
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.eval.infer import XPointInference
    from xpoint_tpu.eval.evaluation import (
        compute_repeatability_multispectral, compute_descriptor_metrics)

    module, _ = build_xpoint({
        'multispectral': False, 'takes_pair': True, 'channel_version': 2,
        'descriptor_size': 32,
        'homography_regression_head': {'check': False}})
    img = jnp.zeros((1, 64, 64, 1))
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    infer = XPointInference(module, variables,
                            {'nms': 4, 'detection_threshold': 1e-4,
                             'topk': 0}, max_kp=256)

    rng = np.random.default_rng(0)
    batch = {
        'optical': {'image': rng.uniform(size=(2, 64, 64, 1)).astype(np.float32),
                    'valid_mask': np.ones((2, 64, 64), np.float32),
                    'homography': np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))},
        'thermal': {'image': rng.uniform(size=(2, 64, 64, 1)).astype(np.float32),
                    'valid_mask': np.ones((2, 64, 64), np.float32),
                    'homography': np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))},
    }
    config = {'prediction': {'nms': 4, 'detection_threshold': 1e-4,
                             'topk': 0, 'cpu_nms': False}}
    mean_rep, reps, nko, nkt = compute_repeatability_multispectral(
        infer, [batch], config, distance_thresh=3)
    assert 0.0 <= mean_rep <= 1.0
    assert len(nko) == 2

    out = compute_descriptor_metrics(infer, [batch],
                                     {'nms': 4, 'detection_threshold': 1e-4,
                                      'reprojection_threshold': 3})
    assert 0.0 <= out['nn_map'] <= 1.0
    assert 0.0 <= out['m_score'] <= 1.0
    assert len(out['pts_dist']) == 2


def test_pipeline_with_on_device_ransac():
    """Full pipeline incl. on-device homography estimation: identity pair
    must register to ~identity."""
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.eval import make_pair_pipeline

    module, _ = build_xpoint({
        'multispectral': False, 'takes_pair': True, 'channel_version': 2,
        'descriptor_size': 32,
        'homography_regression_head': {'check': False}})
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    pipe = make_pair_pipeline(module, (64, 64), k=256, nms_size=4,
                              detection_threshold=1e-4,
                              estimate_homography=True, ransac_iters=64)
    out = pipe(variables, img, img, jax.random.PRNGKey(1))
    H = np.asarray(out['H_est'][0])
    assert out['H_est'].shape == (1, 3, 3)
    # same image both sides -> near-identity homography
    assert np.abs(H - np.eye(3)).max() < 0.3, H
    assert int(out['ransac_n_inliers'][0]) > 10

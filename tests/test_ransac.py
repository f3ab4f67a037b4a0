"""On-device DLT + RANSAC homography estimation tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.geometry.ransac import fit_homography_dlt, ransac_homography


def make_correspondences(rng, n_in=80, n_out=40, noise=0.3):
    H_true = np.array([[1.05, 0.03, 8.0],
                       [-0.02, 0.97, -5.0],
                       [2e-5, -3e-5, 1.0]])
    pts1 = rng.uniform(20, 480, size=(n_in + n_out, 2))
    ones = np.ones((len(pts1), 1))
    p = (np.concatenate([pts1, ones], 1) @ H_true.T)
    pts2 = p[:, :2] / p[:, 2:]
    pts2[:n_in] += rng.normal(0, noise, (n_in, 2))
    pts2[n_in:] = rng.uniform(0, 500, (n_out, 2))      # outliers
    return (pts1.astype(np.float32), pts2.astype(np.float32),
            H_true.astype(np.float64))


def corner_error(H_est, H_true, size=512):
    pts = np.array([[0, 0, 1], [size, 0, 1], [0, size, 1], [size, size, 1]],
                   float)
    a = pts @ np.asarray(H_est, float).T
    b = pts @ H_true.T
    a = a[:, :2] / a[:, 2:]
    b = b[:, :2] / b[:, 2:]
    return np.linalg.norm(a - b, axis=1).mean()


def test_dlt_exact_on_clean_points():
    rng = np.random.default_rng(0)
    pts1, pts2, H_true = make_correspondences(rng, n_in=30, n_out=0, noise=0.0)
    H = fit_homography_dlt(jnp.asarray(pts1[:30]), jnp.asarray(pts2[:30]))
    H = np.asarray(H)
    H = H / H[2, 2]
    assert corner_error(H, H_true) < 0.1


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    pts1, pts2, H_true = make_correspondences(rng)
    N = 256
    p1 = np.zeros((N, 2), np.float32)
    p2 = np.zeros((N, 2), np.float32)
    m = np.zeros((N,), bool)
    p1[:len(pts1)] = pts1
    p2[:len(pts2)] = pts2
    m[:len(pts1)] = True

    out = ransac_homography(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(m),
                            jax.random.PRNGKey(0), threshold=3.0,
                            n_iters=256)
    H = np.asarray(out["H"])
    assert corner_error(H, H_true) < 2.0
    n_in = int(out["n_inliers"])
    assert 60 <= n_in <= 90          # ~80 true inliers
    # outlier rows excluded
    inl = np.asarray(out["inliers"])
    assert inl[120:].sum() <= 8


def test_ransac_agrees_with_cv2_magsac():
    import cv2
    rng = np.random.default_rng(2)
    pts1, pts2, H_true = make_correspondences(rng, n_in=100, n_out=60)
    H_cv, _ = cv2.findHomography(pts1.reshape(-1, 1, 2),
                                 pts2.reshape(-1, 1, 2),
                                 method=cv2.USAC_MAGSAC,
                                 ransacReprojThreshold=3.0,
                                 confidence=0.9999, maxIters=10000)
    N = 256
    p1 = np.zeros((N, 2), np.float32)
    p2 = np.zeros((N, 2), np.float32)
    m = np.zeros((N,), bool)
    p1[:len(pts1)] = pts1
    p2[:len(pts2)] = pts2
    m[:len(pts1)] = True
    out = ransac_homography(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(m),
                            jax.random.PRNGKey(3), threshold=3.0,
                            n_iters=512)
    err_ours = corner_error(np.asarray(out["H"]), H_true)
    err_cv = corner_error(H_cv, H_true)
    assert err_ours < max(2.0 * err_cv, 2.0), (err_ours, err_cv)


def test_estimate_homography_device_wrapper():
    """Host-facing wrapper: pads to a static bucket, returns cv2-shaped
    (H, inlier-mask) and recovers H on noisy correspondences."""
    from xpoint_tpu.geometry.ransac import estimate_homography_device

    rng = np.random.default_rng(4)
    pts1, pts2, H_true = make_correspondences(rng, n_in=90, n_out=30)
    H, inl = estimate_homography_device(pts1, pts2,
                                        reprojection_threshold=3.0,
                                        n_iters=512)
    assert H is not None and H.shape == (3, 3) and H.dtype == np.float64
    assert inl.shape == (len(pts1), 1) and inl.dtype == np.uint8
    assert corner_error(H, H_true) < 2.0
    assert 70 <= int(inl.sum()) <= 100
    # under-determined inputs -> (None, None), like the cv2 path
    assert estimate_homography_device(pts1[:3], pts2[:3]) == (None, None)


def test_estimate_homography_method_dispatch():
    """eval/metrics.estimate_homography(method='device') routes to the
    on-device estimator and agrees with the cv2 MAGSAC default."""
    from xpoint_tpu.eval.metrics import estimate_homography

    rng = np.random.default_rng(5)
    pts1, pts2, H_true = make_correspondences(rng, n_in=100, n_out=40)
    H_cv, _ = estimate_homography(pts1, pts2, reprojection_threshold=3)
    H_dev, _ = estimate_homography(pts1, pts2, reprojection_threshold=3,
                                   method='device')
    err_cv = corner_error(H_cv, H_true)
    err_dev = corner_error(H_dev, H_true)
    assert err_dev < max(2.0 * err_cv, 2.0), (err_dev, err_cv)

def test_estimate_homography_device_truncation_mask_length():
    """Above max_points the estimator fits on a truncated head but the
    returned inlier mask still covers every input match (cv2-shape
    contract: callers boolean-index their match list by it)."""
    from xpoint_tpu.geometry.ransac import estimate_homography_device

    rng = np.random.default_rng(6)
    pts1, pts2, H_true = make_correspondences(rng, n_in=40, n_out=8)
    H, inl = estimate_homography_device(pts1, pts2,
                                        reprojection_threshold=3.0,
                                        n_iters=256, max_points=32)
    assert H is not None
    assert inl.shape == (len(pts1), 1)
    # truncated tail is reported as outliers, never scored
    assert int(inl[32:].sum()) == 0
    assert corner_error(H, H_true) < 2.0


def test_estimate_homography_unknown_method_raises():
    """A typo'd prediction.h_estimator must fail loudly, not silently run
    the cv2 parity path."""
    from xpoint_tpu.eval.metrics import estimate_homography

    rng = np.random.default_rng(7)
    pts1, pts2, _ = make_correspondences(rng, n_in=20, n_out=0)
    with pytest.raises(ValueError, match="h_estimator"):
        estimate_homography(pts1, pts2, method='on-device')


def test_descriptor_metrics_sample_threads_h_estimator():
    """descriptor_metrics_sample forwards h_estimator to the homography
    estimation (the -e evaluation path honors prediction.h_estimator)."""
    from xpoint_tpu.eval.metrics import descriptor_metrics_sample

    kp = np.array([[10, 10], [20, 40], [40, 20], [60, 60], [30, 70]])
    desc = np.eye(5, 8, dtype=np.float32)
    matches = [(i, i, 0.0) for i in range(5)]
    with pytest.raises(ValueError, match="h_estimator"):
        descriptor_metrics_sample(kp, desc, kp, desc, np.eye(3), np.eye(3),
                                  (96, 96), matches_optical=matches,
                                  matches_thermal=matches,
                                  h_estimator='bogus')
    s = descriptor_metrics_sample(kp, desc, kp, desc, np.eye(3), np.eye(3),
                                  (96, 96), matches_optical=matches,
                                  matches_thermal=matches,
                                  h_estimator='device')
    assert s['pts_dist'] < 1.0  # identity pair registers

def test_prosac_quality_sampling_finds_low_ratio_consensus():
    """With inliers concentrated among the best-quality matches (the real
    matcher regime), PROSAC-style progressive sampling recovers H at an
    inlier ratio where uniform sampling with the same small hypothesis
    budget usually cannot."""
    rng = np.random.default_rng(11)
    H_true = np.array([[1.02, 0.05, 6.0],
                       [-0.03, 0.98, -4.0],
                       [1e-5, -2e-5, 1.0]])
    n_in, n_out = 10, 190
    pts1 = rng.uniform(30, 470, size=(n_in + n_out, 2)).astype(np.float32)
    ones = np.ones((len(pts1), 1))
    p = np.concatenate([pts1, ones], 1) @ H_true.T
    pts2 = (p[:, :2] / p[:, 2:]).astype(np.float32)
    pts2[:n_in] += rng.normal(0, 0.4, (n_in, 2)).astype(np.float32)
    pts2[n_in:] = rng.uniform(0, 500, (n_out, 2)).astype(np.float32)
    # quality: true inliers get the best (lowest) descriptor distances
    quality = np.empty(len(pts1), np.float32)
    quality[:n_in] = rng.uniform(0.1, 0.4, n_in)
    quality[n_in:] = rng.uniform(0.5, 1.5, n_out)

    mask = jnp.ones((len(pts1),), bool)
    out = ransac_homography(jnp.asarray(pts1), jnp.asarray(pts2), mask,
                            jax.random.PRNGKey(3), threshold=3.0,
                            n_iters=256, quality=jnp.asarray(quality))
    assert corner_error(np.asarray(out["H"]), H_true) < 3.0
    inl = np.asarray(out["inliers"])
    assert inl[:n_in].sum() >= 8 and inl[n_in:].sum() <= 3

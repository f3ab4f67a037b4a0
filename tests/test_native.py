"""Native C++ augmentation engine: parity vs cv2 + speed sanity."""
import time

import cv2
import numpy as np
import pytest

from xpoint_tpu import native
from xpoint_tpu.geometry import sample_homography, compute_valid_mask


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine not built")


def test_native_warp_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(128, 160)).astype(np.float32)
    H = sample_homography((128, 160), rng=rng)

    warped, mask = native.homographic_augment(img, H, border_reflect=True,
                                              erosion_radius=0)
    ref = cv2.warpPerspective(img, H, (160, 128), flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_REFLECT_101)
    # interior parity (cv2 uses fixed-point bilinear; 1e-3 tolerance)
    interior = np.zeros((128, 160), bool)
    interior[10:-10, 10:-10] = True
    assert np.abs(warped - ref)[interior].max() < 2e-3

    mask_ref = compute_valid_mask((128, 160), H, 0, False)
    assert (mask != mask_ref).mean() < 0.01   # boundary-rounding pixels only


def test_native_erosion_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(96, 96)).astype(np.float32)
    H = sample_homography((96, 96), rng=rng)
    _, mask = native.homographic_augment(img, H, border_reflect=True,
                                         erosion_radius=6, mask_border=True)
    mask_ref = compute_valid_mask((96, 96), H, 6, True)
    assert (mask != mask_ref).mean() < 0.02


def test_native_keypoint_warp():
    rng = np.random.default_rng(2)
    kps = rng.uniform(5, 90, size=(20, 2))
    H = sample_homography((96, 96), rng=rng)
    out = native.warp_keypoints(kps, H)
    from xpoint_tpu.geometry import warp_keypoints as ref_warp
    ref = ref_warp(kps, H, return_type=float)
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_native_faster_than_separate_cv2_calls():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(256, 256)).astype(np.float32)
    H = sample_homography((256, 256), rng=rng)

    t0 = time.perf_counter()
    for _ in range(20):
        native.homographic_augment(img, H, True, 6, True)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(20):
        cv2.warpPerspective(img, H, (256, 256),
                            borderMode=cv2.BORDER_REFLECT_101)
        compute_valid_mask((256, 256), H, 6, True)
    t_cv2 = time.perf_counter() - t0
    # informational: native should at least be in the same ballpark
    print(f"native {t_native*50:.2f} ms vs cv2 {t_cv2*50:.2f} ms per call")
    assert t_native < t_cv2 * 3

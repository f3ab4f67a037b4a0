from .homography import (
    sample_homography,
    sample_homography_corner,
    compute_valid_mask,
    compute_valid_mask_device,
    warp_keypoints,
    filter_points,
    warp_points,
)

__all__ = [
    "sample_homography",
    "sample_homography_corner",
    "compute_valid_mask",
    "compute_valid_mask_device",
    "warp_keypoints",
    "filter_points",
    "warp_points",
]

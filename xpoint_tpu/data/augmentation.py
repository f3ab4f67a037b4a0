"""Augmentation orchestration (host side).

Parity: reference datasets/augmentation/augmentation.py — photometric
primitives in random order; homographic warp with cv2 (BORDER_REFLECT_101 or
constant), valid-mask with border erosion, keypoint warp + filter.
"""
import random

import cv2
import numpy as np

from ..utils import parse_primitives
from ..geometry import (sample_homography, sample_homography_corner,
                        compute_valid_mask, warp_keypoints, filter_points)
from . import photometric as photoaug


def photometric_augmentation(image, primitives='all', params=None,
                             random_order=True, enable=True):
    prims = parse_primitives(primitives, photoaug.augmentations)
    configs = [(params or {}).get(p, {}) for p in prims]
    order = list(range(len(prims)))
    if random_order:
        random.shuffle(order)
    for idx in order:
        image = getattr(photoaug, prims[idx])(image, **configs[idx])
    return image


def homographic_augmentation(image, keypoints=None, return_homography=False,
                             params=None, border_reflect=True,
                             valid_border_margin=0, mask_border=True,
                             enable=True):
    import os
    params = dict(params or {})
    corner = params.pop('corner_homography', None)
    image_shape = image.shape
    if corner and corner.get('enable'):
        homography = sample_homography_corner(image_shape, corner['params'])
    else:
        homography = sample_homography(image_shape, **params)

    # fused native engine (warp + mask + erosion in one C call); cv2 fallback
    native_out = None
    if not os.environ.get('XPOINT_NO_NATIVE'):
        from .. import native
        native_out = native.homographic_augment(
            image, homography, border_reflect,
            valid_border_margin * 2, mask_border)
    if native_out is not None:
        warped_image, valid_mask = native_out
    else:
        border_mode = (cv2.BORDER_REFLECT_101 if border_reflect
                       else cv2.BORDER_CONSTANT)
        warped_image = cv2.warpPerspective(image, homography,
                                           image.shape[::-1],
                                           borderMode=border_mode)
        valid_mask = compute_valid_mask(image_shape, homography,
                                        valid_border_margin * 2, mask_border)

    if keypoints is not None and np.size(keypoints) > 0:
        warped_points = warp_keypoints(keypoints, homography)
        warped_points = filter_points(warped_points, image_shape)
    else:
        warped_points = keypoints

    if return_homography:
        return warped_image, warped_points, valid_mask, homography
    return warped_image, warped_points, valid_mask


def dummy_valid_mask(image_shape):
    return np.ones(image_shape)

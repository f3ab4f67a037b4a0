"""Homography sampling and point warping.

Host side (numpy/cv2): random homography sampling for augmentation and
homographic adaptation, valid-mask computation, keypoint warping. These run
in the data pipeline, never inside jit.

Device side (jnp): batched point warping used by the descriptor loss.

Parity targets (reference /root/reference/xpoint/utils/homographies.py):
  sample_homography        :303-453  (SuperPoint-style unit-square perturbation)
  sample_homography_corner :455-477  (DeepHomography corner jitter, returns H^-1)
  warp_keypoints           :479-495
  warp_points_pytorch      :498-508  -> warp_points (jnp)
  filter_points            :511-526
  compute_valid_mask       :529-558
"""
from math import pi

import cv2
import numpy as np

import jax.numpy as jnp


def sample_homography(image_shape, perspective=True, scaling=True, rotation=True,
                      translation=True, n_scales=10, n_angles=25,
                      scaling_amplitude=0.2, perspective_amplitude_x=0.1,
                      perspective_amplitude_y=0.1, patch_ratio=0.8,
                      max_angle=pi / 2, allow_artifacts=True,
                      translation_overflow=0.1, corner_homography=None,
                      rng=None):
    """Sample a random homography as a perturbation of the unit square.

    The output patch corners start as a centered ``patch_ratio`` square and
    are perturbed by perspective / scale / translation / rotation transforms
    applied in a random order; the result is rescaled to pixel units and
    fitted with a 4-point perspective transform. Distributionally equivalent
    to the reference sampler (homographies.py:303-453).

    Args:
        image_shape: (H, W) of the image the homography will warp.
        rng: optional ``np.random.Generator`` for reproducibility.

    Returns:
        (3, 3) float64 homography mapping original -> warped pixel coords
        in cv2 (x=col, y=row) convention.
    """
    # default to a Generator seeded from the GLOBAL np.random stream:
    # the reference samples via legacy np.random (homographies.py:303+),
    # so a CLI-level np.random.seed() must make these draws
    # reproducible too (an unseeded default_rng() pulls OS entropy and
    # made every eval's warp set different run to run)
    if rng is None:
        # NOTE: high=2**31 needs int64 legacy randint (Linux/macOS);
        # changing the bound would change the derived seeds and every
        # committed seeded metric, so it stays as-is
        rng = np.random.default_rng(np.random.randint(0, 2**31))

    def _uniform(lo, hi):
        # legacy np.random.uniform tolerates hi < lo; Generator does not
        return rng.uniform(min(lo, hi), max(lo, hi))

    def transform_perspective(points):
        t_min, t_max = -points.min(axis=0), 1.0 - points.max(axis=0)
        t_max[1] = min(abs(t_min[1]), abs(t_max[1]))
        t_min[1] = -t_max[1]
        if not allow_artifacts:
            amp_min = np.maximum(np.array([-perspective_amplitude_x, -perspective_amplitude_y]), t_min)
            amp_max = np.minimum(np.array([perspective_amplitude_x, perspective_amplitude_y]), t_max)
        else:
            amp_min = np.array([-perspective_amplitude_x, -perspective_amplitude_y])
            amp_max = np.array([perspective_amplitude_x, perspective_amplitude_y])

        persp_disp = _uniform(amp_min[1], amp_max[1])
        h_left = _uniform(amp_min[0], amp_max[0])
        h_right = _uniform(amp_min[0], amp_max[0])
        return points + np.array([[h_left, persp_disp],
                                  [h_left, -persp_disp],
                                  [h_right, persp_disp],
                                  [h_right, -persp_disp]])

    def transform_scale(points):
        scales = rng.uniform(-scaling_amplitude, scaling_amplitude, n_scales) + 1.0
        center = points.mean(axis=0)
        scaled = (points - center)[None] * scales[:, None, None] + center
        if allow_artifacts:
            valid = np.arange(n_scales)
        else:
            valid = [i for i in range(n_scales)
                     if scaled[i].max() < 1.0 and scaled[i].min() >= 0.0]
            if not valid:
                return points
        return scaled[rng.choice(valid)]

    def transform_translation(points):
        t_min, t_max = -points.min(axis=0), 1.0 - points.max(axis=0)
        if allow_artifacts:
            t_min = t_min - translation_overflow
            t_max = t_max + translation_overflow
        return points + np.array([_uniform(t_min[0], t_max[0]),
                                  _uniform(t_min[1], t_max[1])])

    def transform_rotation(points):
        angles = rng.uniform(-max_angle, max_angle, n_angles)
        angles = np.append(angles, 0)  # fallback: no rotation
        center = points.mean(axis=0)
        rot = np.stack([np.cos(angles), -np.sin(angles),
                        np.sin(angles), np.cos(angles)], axis=1).reshape(-1, 2, 2)
        rotated = np.matmul((points - center)[None], rot) + center
        if allow_artifacts:
            valid = np.arange(n_angles)
        else:
            valid = [i for i in range(len(angles))
                     if rotated[i].max() < 1.0 and rotated[i].min() >= 0.0]
        return rotated[rng.choice(valid)]

    pts1 = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    margin = (1 - patch_ratio) * 0.5
    pts2 = margin + patch_ratio * pts1

    functions = []
    if perspective:
        functions.append(transform_perspective)
    if scaling:
        functions.append(transform_scale)
    if translation:
        functions.append(transform_translation)
    if rotation:
        functions.append(transform_rotation)

    order = rng.permutation(len(functions))
    for idx in order:
        pts2 = functions[idx](pts2)

    # rescale unit square to pixel units; shape is (H, W) -> (x, y) = (W, H)
    shape = np.asarray(image_shape)[::-1]
    pts1 = (pts1 * shape).astype(np.float32)
    pts2 = (pts2 * shape).astype(np.float32)
    return cv2.getPerspectiveTransform(pts1, pts2).astype(np.float64)


def sample_homography_corner(image_shape, config, rng=None):
    """DeepHomography-style +-rho corner jitter of a random patch; returns the
    INVERSE homography like the reference (homographies.py:455-477)."""
    # default to a Generator seeded from the GLOBAL np.random stream:
    # the reference samples via legacy np.random (homographies.py:303+),
    # so a CLI-level np.random.seed() must make these draws
    # reproducible too (an unseeded default_rng() pulls OS entropy and
    # made every eval's warp set different run to run)
    if rng is None:
        # NOTE: high=2**31 needs int64 legacy randint (Linux/macOS);
        # changing the bound would change the derived seeds and every
        # committed seeded metric, so it stays as-is
        rng = np.random.default_rng(np.random.randint(0, 2**31))
    imsize = (image_shape[1], image_shape[0])
    rho = config["rho"]
    patch_size = config["patch_size"]
    pos = (int(rng.integers(rho, imsize[0] - rho - patch_size + 1)),
           int(rng.integers(rho, imsize[1] - rho - patch_size + 1)))
    four_points = [pos,
                   (pos[0] + patch_size, pos[1]),
                   (pos[0] + patch_size, pos[1] + patch_size),
                   (pos[0], pos[1] + patch_size)]
    perturbed = [(p[0] + int(rng.integers(-rho, rho + 1)),
                  p[1] + int(rng.integers(-rho, rho + 1))) for p in four_points]
    H = cv2.getPerspectiveTransform(np.float32(four_points), np.float32(perturbed))
    return np.linalg.inv(H)


def warp_keypoints(keypoints, homography, return_type=int):
    """Warp (row, col) keypoints by a pixel-space homography (cv2 x/y
    convention internally) — homographies.py:479-495."""
    if len(keypoints) > 0:
        warped = cv2.perspectiveTransform(
            np.array([keypoints[:, ::-1]], dtype=np.float64), homography)
        return warped[0, :, ::-1].astype(return_type)
    return keypoints


def filter_points(points, shape):
    """Drop points outside [0, shape) — homographies.py:511-526."""
    points = points[points[:, 0] >= 0]
    points = points[points[:, 1] >= 0]
    points = points[points[:, 0] < shape[0]]
    points = points[points[:, 1] < shape[1]]
    return points


def compute_valid_mask(image_shape, homography, erosion_radius=0, mask_border=False):
    """Valid-pixel mask after warping an all-ones image, with optional
    erosion (and border-included erosion) — homographies.py:529-558."""
    mask = cv2.warpPerspective(np.ones(image_shape), homography,
                               image_shape[::-1], flags=cv2.INTER_NEAREST)
    if erosion_radius > 0:
        if mask_border:
            tmp = np.zeros((image_shape[0] + 2, image_shape[1] + 2))
            tmp[1:-1, 1:-1] = mask
            mask = tmp
        kernel = np.ones((erosion_radius * 2 + 1, erosion_radius * 2 + 1), np.float32)
        mask = cv2.erode(mask, kernel, iterations=1)
        if mask_border:
            mask = mask[1:-1, 1:-1]
    return mask


def compute_valid_mask_device(homographies, image_shape, erosion_radius=0,
                              mask_border=False):
    """On-device batched compute_valid_mask: (n, 3, 3) -> (n, H, W) float32.

    The warped all-ones mask is analytic — a bounds test on the inverse-
    mapped sample coordinates, no gather — and erosion by the square
    (2r+1)^2 kernel (homographies.py:529-558 uses np.ones) is a min-pool:
    `reduce_window` with +inf init reproduces cv2.erode's default
    don't-shrink border exactly. Keeping this in-graph avoids shipping
    num x H x W mask planes to the device per sample.
    """
    import jax
    from ..ops.warp import _source_coords

    Hh, Ww = image_shape
    ys, xs = _source_coords(homographies, Hh, Ww)
    yi = jnp.round(ys)
    xi = jnp.round(xs)
    m = (yi >= 0) & (yi <= Hh - 1) & (xi >= 0) & (xi <= Ww - 1)
    m = m.astype(jnp.float32).reshape(-1, Hh, Ww)
    if erosion_radius > 0:
        k = 2 * erosion_radius + 1
        if mask_border:
            m = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
        m = jax.lax.reduce_window(m, jnp.inf, jax.lax.min,
                                  (1, k, k), (1, 1, 1), "SAME")
        if mask_border:
            m = m[:, 1:-1, 1:-1]
    return m


def warp_points(points, homography):
    """Batched (row, col) point warp on device.

    Args:
        points: (B, N, 2) float array in (row, col) order.
        homography: (B, 3, 3) pixel-space homography acting on (x, y, 1)
            column vectors (cv2 convention).

    Returns:
        (B, N, 2) warped points in (row, col) order.

    Parity: reference warp_points_pytorch (homographies.py:498-508).
    """
    xy = jnp.flip(points, axis=-1)  # (row, col) -> (x, y)
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    homog = jnp.concatenate([xy, ones], axis=-1)            # (B, N, 3)
    warped = jnp.einsum("bij,bnj->bni", homography.astype(points.dtype), homog,
                        precision="highest")
    warped = warped[..., :2] / warped[..., 2:]
    return jnp.flip(warped, axis=-1)

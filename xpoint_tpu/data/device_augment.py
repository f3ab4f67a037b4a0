"""On-device homographic augmentation for the training hot loop.

The reference augments on host CPU workers (cv2.warpPerspective per
sample inside Dataset.__getitem__, homographies.py:303-453 +
image_pair_dataset.py); at one host core that costs ~100 ms/sample and
leaves the TPU idle most of each training step. This module re-designs
augmentation TPU-first: homography sampling, image warping, valid-mask
computation, keypoint-map generation and the RegNet hm-input prep all
run inside the jitted train step on device, so the host contributes
nothing per step but the dispatch.

Semantics match the host path (`data/augmentation.py`) given the same
homography: identical warp (bilinear, REFLECT_101 or zeros), identical
valid mask (nearest-rounding bounds test + square-kernel erosion),
identical keypoint-map truncation (astype(int), i.e. trunc-toward-zero,
homographies.py:479-495). Homography SAMPLING is distributionally
equivalent (same transform set, amplitudes and random ordering) but uses
jax.random instead of numpy, so individual draws differ from the host
sampler at equal seeds.
"""
from functools import partial

import jax
import jax.numpy as jnp


def _solve_h4(pts_src, pts_dst):
    """4-point homography fit (cv2.getPerspectiveTransform): solve the
    8x8 DLT system for H mapping pts_src -> pts_dst, both (4, 2) in
    (x, y) pixel coords."""
    x, y = pts_src[:, 0], pts_src[:, 1]
    u, v = pts_dst[:, 0], pts_dst[:, 1]
    z = jnp.zeros(4, pts_src.dtype)
    o = jnp.ones(4, pts_src.dtype)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)
    b = jnp.concatenate([u, v], axis=0)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1, h.dtype)]).reshape(3, 3)


def sample_homography_device(key, image_shape, perspective=True,
                             scaling=True, rotation=True, translation=True,
                             n_scales=10, n_angles=25, scaling_amplitude=0.2,
                             perspective_amplitude_x=0.1,
                             perspective_amplitude_y=0.1, patch_ratio=0.8,
                             max_angle=jnp.pi / 2, allow_artifacts=True,
                             translation_overflow=0.1, **_ignored):
    """jax.random port of geometry.homography.sample_homography (itself
    distributionally equivalent to reference homographies.py:303-453).

    Returns a (3, 3) float32 homography mapping original -> warped pixel
    coords in cv2 (x=col, y=row) convention. Fully traceable: the random
    transform ORDER is a lax.switch over the enabled transforms per slot.
    """
    ks = jax.random.split(key, 8)

    def uniform(k, lo, hi):
        # legacy np.random.uniform tolerates hi < lo (host sampler quirk)
        lo_, hi_ = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
        return jax.random.uniform(k, (), jnp.float32, lo_, hi_)

    def t_perspective(key, points):
        k1, k2, k3 = jax.random.split(key, 3)
        t_min = -points.min(axis=0)
        t_max = 1.0 - points.max(axis=0)
        ty = jnp.minimum(jnp.abs(t_min[1]), jnp.abs(t_max[1]))
        t_min = t_min.at[1].set(-ty)
        t_max = t_max.at[1].set(ty)
        if not allow_artifacts:
            amp_min = jnp.maximum(
                jnp.array([-perspective_amplitude_x,
                           -perspective_amplitude_y]), t_min)
            amp_max = jnp.minimum(
                jnp.array([perspective_amplitude_x,
                           perspective_amplitude_y]), t_max)
        else:
            amp_min = jnp.array([-perspective_amplitude_x,
                                 -perspective_amplitude_y])
            amp_max = jnp.array([perspective_amplitude_x,
                                 perspective_amplitude_y])
        persp_disp = uniform(k1, amp_min[1], amp_max[1])
        h_left = uniform(k2, amp_min[0], amp_max[0])
        h_right = uniform(k3, amp_min[0], amp_max[0])
        return points + jnp.stack(
            [jnp.stack([h_left, persp_disp]),
             jnp.stack([h_left, -persp_disp]),
             jnp.stack([h_right, persp_disp]),
             jnp.stack([h_right, -persp_disp])])

    def t_scale(key, points):
        k1, k2 = jax.random.split(key)
        scales = 1.0 + jax.random.uniform(
            k1, (n_scales,), jnp.float32,
            -scaling_amplitude, scaling_amplitude)
        center = points.mean(axis=0)
        scaled = (points - center)[None] * scales[:, None, None] + center
        if allow_artifacts:
            idx = jax.random.randint(k2, (), 0, n_scales)
            return scaled[idx]
        valid = (scaled.max(axis=(1, 2)) < 1.0) & \
                (scaled.min(axis=(1, 2)) >= 0.0)
        any_valid = valid.any()
        # uniform choice among valid via masked categorical; fall back to
        # the untouched points when none is valid (host: `return points`)
        logits = jnp.where(valid, 0.0, -jnp.inf)
        idx = jax.random.categorical(k2, logits)
        idx = jnp.where(any_valid, idx, 0)
        return jnp.where(any_valid, scaled[idx], points)

    def t_translation(key, points):
        k1, k2 = jax.random.split(key)
        t_min = -points.min(axis=0)
        t_max = 1.0 - points.max(axis=0)
        if allow_artifacts:
            t_min = t_min - translation_overflow
            t_max = t_max + translation_overflow
        return points + jnp.stack([uniform(k1, t_min[0], t_max[0]),
                                   uniform(k2, t_min[1], t_max[1])])

    def t_rotation(key, points):
        k1, k2 = jax.random.split(key)
        angles = jax.random.uniform(k1, (n_angles,), jnp.float32,
                                    -max_angle, max_angle)
        angles = jnp.append(angles, 0.0)    # fallback slot (host parity)
        center = points.mean(axis=0)
        rot = jnp.stack([jnp.cos(angles), -jnp.sin(angles),
                         jnp.sin(angles), jnp.cos(angles)],
                        axis=1).reshape(-1, 2, 2)
        rotated = jnp.matmul((points - center)[None], rot) + center
        if allow_artifacts:
            # host picks among the first n_angles (excluding the appended 0)
            idx = jax.random.randint(k2, (), 0, n_angles)
            return rotated[idx]
        valid = (rotated.max(axis=(1, 2)) < 1.0) & \
                (rotated.min(axis=(1, 2)) >= 0.0)
        logits = jnp.where(valid, 0.0, -jnp.inf)
        # the appended zero-angle entry is always valid, so the
        # categorical is always well-defined
        idx = jax.random.categorical(k2, logits)
        return rotated[idx]

    fns = []
    if perspective:
        fns.append(t_perspective)
    if scaling:
        fns.append(t_scale)
    if translation:
        fns.append(t_translation)
    if rotation:
        fns.append(t_rotation)

    pts1 = jnp.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]],
                     jnp.float32)
    margin = (1.0 - patch_ratio) * 0.5
    pts2 = margin + patch_ratio * pts1

    if fns:
        perm = jax.random.permutation(ks[0], len(fns))
        for slot in range(len(fns)):
            branches = [partial(f, ks[1 + slot]) for f in fns]
            pts2 = jax.lax.switch(perm[slot], branches, pts2)

    # rescale unit square to pixel units; (H, W) -> (x, y) = (W, H)
    shape = jnp.array([image_shape[1], image_shape[0]], jnp.float32)
    return _solve_h4(pts1 * shape, pts2 * shape)


def warp_keypoint_map(coords, valid, homography, image_shape):
    """Warp padded (row, col) keypoint coords by a homography and scatter
    them to a binary (H, W) map.

    Matches the host chain warp_keypoints -> filter_points ->
    generate_keypoint_map exactly for a given H: cv2 x/y convention,
    trunc-toward-zero int cast (homographies.py:479-495), bounds filter.

    Args:
        coords: (K, 2) float32 (row, col), padded.
        valid: (K,) bool padding mask.
        homography: (3, 3) original -> warped.
        image_shape: static (H, W).
    """
    Hh, Ww = image_shape
    xy = jnp.flip(coords.astype(jnp.float32), -1)       # (K, 2) x, y
    ones = jnp.ones((xy.shape[0], 1), jnp.float32)
    p = jnp.concatenate([xy, ones], axis=1) @ homography.astype(jnp.float32).T
    p = p[:, :2] / p[:, 2:3]
    rc = jnp.flip(p, -1)                                # back to row, col
    rci = rc.astype(jnp.int32)                          # trunc toward zero
    inb = ((rc[:, 0] >= 0) & (rc[:, 1] >= 0)
           & (rc[:, 0] < Hh) & (rc[:, 1] < Ww) & valid)
    rr = jnp.clip(rci[:, 0], 0, Hh - 1)
    cc = jnp.clip(rci[:, 1], 0, Ww - 1)
    kp_map = jnp.zeros((Hh, Ww), jnp.float32)
    return kp_map.at[rr, cc].max(inb.astype(jnp.float32))


def keypoint_map_from_coords(coords, valid, image_shape):
    """Unwarped padded coords -> binary map (generate_keypoint_map)."""
    return warp_keypoint_map(coords, valid, jnp.eye(3, dtype=jnp.float32),
                             image_shape)


def prep_hm_input_device(optical, thermal, h_optical, h_thermal,
                         top_left, patch_size):
    """Device port of ImagePairDataset.prep_hm_regression_input
    (image_pair.py:284-309, reference ImagePairDataset.py:439-483),
    preserving its quirks exactly: corner displacement under
    M = H_o @ H_t with NO homogeneous division and int truncation, and
    the SAME static crop window from both augmented images.

    Args:
        optical/thermal: (H, W, 1) AUGMENTED images.
        h_optical/h_thermal: (3, 3) augmentation homographies.
        top_left: static (x, y) as the host passes it; patch_size (h, w).
    """
    ph, pw = patch_size
    a, b = top_left                              # host tl = (x, y)
    corners = jnp.array([[a, b], [a + pw, b], [a + pw, b + ph], [a, b + ph]],
                        jnp.float32)             # tl, tr, br, bl
    M = h_optical.astype(jnp.float32) @ h_thermal.astype(jnp.float32)
    ones = jnp.ones((4, 1), jnp.float32)
    p = (jnp.concatenate([corners, ones], axis=1) @ M.T)[:, :2]
    # reference skips the homogeneous division (ImagePairDataset.py:451-453)
    hfour = (p.astype(jnp.int32).astype(jnp.float32) - corners)

    # crop rows min(ys):max(ys), cols min(xs):max(xs) of BOTH images
    patch_o = jax.lax.dynamic_slice(optical, (b, a, 0), (ph, pw, 1))
    patch_t = jax.lax.dynamic_slice(thermal, (b, a, 0), (ph, pw, 1))
    return jnp.concatenate([patch_o, patch_t], axis=-1), hfour


def make_pair_augment(image_shape, params, border_reflect=True,
                      valid_border_margin=0, mask_border=True,
                      hm_input=False, hm_top_left=None,
                      hm_patch=(128, 128)):
    """Build the batched device augmentation fn for the pair train path.

    Returns fn(key, batch) -> batch implementing the host
    ImagePairDataset homographic branch (image_pair.py:236-266): per
    sample, ONE side (coin flip) is warped by a fresh random homography;
    the other keeps identity. Keypoint maps are regenerated from the
    padded coords carried in the batch ('keypoint_coords'/'keypoint_valid'
    per side), valid masks are computed analytically, and the RegNet
    hm_input/hfour_points are prepared on device when hm_input=True.
    """
    from ..geometry.homography import compute_valid_mask_device
    from ..ops.warp import warp_image_batch

    Hh, Ww = image_shape
    pad_mode = "reflection" if border_reflect else "zeros"
    sampler = partial(sample_homography_device, image_shape=image_shape,
                      **params)
    # The host default patch is 128^2 (image_pair.py:286) and assumes
    # >=128^2 crops; for smaller images the host numpy slice would silently
    # return a short patch, but dynamic_slice needs static in-bounds sizes —
    # clamp to the image instead.
    hm_patch = (min(hm_patch[0], Hh), min(hm_patch[1], Ww))
    if hm_top_left is None:
        hm_top_left = (Hh // 2 - hm_patch[0] // 2, Ww // 2 - hm_patch[1] // 2)

    def augment(key, batch):
        B = batch['optical']['image'].shape[0]
        k_h, k_side = jax.random.split(key)
        hs = jax.vmap(sampler)(jax.random.split(k_h, B))       # (B, 3, 3)
        warp_optical = jax.random.bernoulli(k_side, 0.5, (B,)) # coin flip
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        h_o = jnp.where(warp_optical[:, None, None], hs, eye)
        h_t = jnp.where(warp_optical[:, None, None], eye, hs)

        out = {'optical': dict(batch['optical']),
               'thermal': dict(batch['thermal'])}
        for side, h_side, warped in (('optical', h_o, warp_optical),
                                     ('thermal', h_t, ~warp_optical)):
            img = batch[side]['image']
            out[side]['image'] = warp_image_batch(
                img, h_side, mode="bilinear", padding_mode=pad_mode)
            # host parity: the NON-warped side gets a dummy all-ones mask
            # (image_pair.py:238,242 dummy_valid_mask) — no border erosion
            mask = compute_valid_mask_device(
                h_side, image_shape, valid_border_margin * 2, mask_border)
            out[side]['valid_mask'] = jnp.where(
                warped[:, None, None], mask, jnp.ones_like(mask))
            out[side]['homography'] = h_side
            if 'keypoint_coords' in batch[side]:
                out[side]['keypoints'] = jax.vmap(
                    partial(warp_keypoint_map, image_shape=image_shape))(
                        batch[side]['keypoint_coords'],
                        batch[side]['keypoint_valid'], h_side)
                out[side].pop('keypoint_coords', None)
                out[side].pop('keypoint_valid', None)

        if hm_input:
            hm, hfour = jax.vmap(partial(prep_hm_input_device,
                                         top_left=hm_top_left,
                                         patch_size=hm_patch))(
                out['optical']['image'], out['thermal']['image'], h_o, h_t)
            out['hm_input'] = hm
            out['hfour_points'] = hfour
        for k, v in batch.items():
            if k not in ('optical', 'thermal'):
                out.setdefault(k, v)
        return out

    return augment

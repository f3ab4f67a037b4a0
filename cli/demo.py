#!/usr/bin/env python
"""End-user demo: register a visible/other-spectrum image pair
(reference demo.py): detect + describe + match + MAGSAC homography,
checkerboard overlay + match visualization + metrics."""
import argparse
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_gray(path, size=None):
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
    if size is not None:
        gray = cv2.resize(gray, size[::-1], interpolation=cv2.INTER_LINEAR)
    h = gray.shape[0] // 32 * 32
    w = gray.shape[1] // 32 * 32
    return gray[:h, :w]


def checkerboard_overlay(im1, im2, tiles=8):
    """Alternating-tile composite of the registered pair (demo.py:222)."""
    H, W = im1.shape[:2]
    th, tw = H // tiles, W // tiles
    out = im1.copy()
    for i in range(tiles):
        for j in range(tiles):
            if (i + j) % 2:
                out[i * th:(i + 1) * th, j * tw:(j + 1) * tw] = \
                    im2[i * th:(i + 1) * th, j * tw:(j + 1) * tw]
    return out


def main():
    parser = argparse.ArgumentParser(description='XPoint-TPU registration demo')
    parser.add_argument('--visible', required=True)
    parser.add_argument('--other', required=True)
    parser.add_argument('--config', default='configs/cipdp.yaml')
    parser.add_argument('--model-dir', default='model_weights/xpoint')
    parser.add_argument('--version', default='latest')
    parser.add_argument('--output', default='demo_results')
    parser.add_argument('--plot', action='store_true')
    args = parser.parse_args()

    from xpoint_tpu.config import load_yaml
    from xpoint_tpu.model_io import load_model
    from xpoint_tpu.eval.infer import XPointInference
    from xpoint_tpu.eval.metrics import estimate_homography

    config = load_yaml(args.config)
    module, variables, _ = load_model(args.model_dir, args.version)
    infer = XPointInference(module, variables, config.get('prediction', {}))

    visible = load_gray(args.visible)
    other = load_gray(args.other, size=visible.shape[:2])
    img_o = visible[None, ..., None]
    img_t = other[None, ..., None]

    t0 = time.time()
    prob_o, prob_t, desc_o, desc_t, _ = infer.forward_pair(img_o, img_t)
    prob_o, prob_t = infer.nms(prob_o), infer.nms(prob_t)
    kp_o = infer.keypoints_from_prob(prob_o[0])
    kp_t = infer.keypoints_from_prob(prob_t[0])
    d_o = infer.descriptors_at(kp_o, desc_o[0], visible.shape[:2])
    d_t = infer.descriptors_at(kp_t, desc_t[0], visible.shape[:2])
    matches = infer.match(d_o, d_t)
    print(f"pipeline: {time.time()-t0:.2f}s — {len(kp_o)}/{len(kp_t)} "
          f"keypoints, {len(matches)} matches")

    pts_o = np.float32([kp_o[q][::-1] for q, t, d in matches])
    pts_t = np.float32([kp_t[t][::-1] for q, t, d in matches])
    H_est, inlier_mask = estimate_homography(
        pts_o, pts_t, config.get('prediction', {}).get(
            'reprojection_threshold', 3))

    os.makedirs(args.output, exist_ok=True)
    vis8 = (np.clip(visible, 0, 1) * 255).astype(np.uint8)
    oth8 = (np.clip(other, 0, 1) * 255).astype(np.uint8)

    if H_est is not None:
        inliers = int(inlier_mask.sum()) if inlier_mask is not None else 0
        print(f"homography estimated ({inliers} inliers):")
        print(np.array2string(H_est, precision=4))
        warped = cv2.warpPerspective(vis8, H_est, vis8.shape[:2][::-1])
        cv2.imwrite(os.path.join(args.output, 'registered_checkerboard.png'),
                    checkerboard_overlay(warped, oth8))
    else:
        print("registration failed: not enough matches")

    kps_o = [cv2.KeyPoint(float(c[1]), float(c[0]), 4) for c in kp_o]
    kps_t = [cv2.KeyPoint(float(c[1]), float(c[0]), 4) for c in kp_t]
    dm = [cv2.DMatch(q, t, d) for q, t, d in matches]
    match_img = cv2.drawMatches(cv2.cvtColor(vis8, cv2.COLOR_GRAY2BGR), kps_o,
                                cv2.cvtColor(oth8, cv2.COLOR_GRAY2BGR), kps_t,
                                dm, None, flags=2)
    cv2.imwrite(os.path.join(args.output, 'matches.png'), match_img)
    print(f"outputs written to {args.output}/")


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Generate and save SyntheticShapes samples with keypoint overlays
(reference show_synthetic_images.py)."""
import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description='Show synthetic samples')
    parser.add_argument('-n', dest='sample_number', type=int, default=1)
    parser.add_argument('-r', dest='radius', type=int, default=1)
    parser.add_argument('-y', dest='yaml', default=None)
    parser.add_argument('-m', dest='show_mask', action='store_true')
    parser.add_argument('-o', '--output-dir', default='outputs')
    args = parser.parse_args()

    from xpoint_tpu.config import load_yaml
    from xpoint_tpu.data import SyntheticShapes

    cfg = {}
    if args.yaml:
        cfg = load_yaml(args.yaml).get('dataset', {})
    ds = SyntheticShapes(cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.sample_number):
        s = ds[i]
        im = cv2.cvtColor((np.clip(s['image'][..., 0], 0, 1) * 255)
                          .astype(np.uint8), cv2.COLOR_GRAY2BGR)
        for r, c in np.argwhere(s['keypoints']):
            cv2.circle(im, (int(c), int(r)), args.radius, (0, 255, 0), 1)
        if args.show_mask:
            im[~s['valid_mask'].astype(bool)] = (im[~s['valid_mask'].astype(bool)]
                                                 * 0.4 + (0, 0, 150) * 0.6)
        path = os.path.join(args.output_dir, f'synthetic_{i}.png')
        cv2.imwrite(path, im)
        print(f'wrote {path} ({int(s["keypoints"].sum())} keypoints)')


if __name__ == '__main__':
    main()

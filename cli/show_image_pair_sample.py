#!/usr/bin/env python
"""Show an optical/thermal pair from an HDF5 dataset (reference
show_image_pair_sample.py)."""
import argparse
import os
import sys

import cv2
import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description='Show an image pair sample')
    parser.add_argument('-i', '--input-file', default='/tmp/test.hdf5')
    parser.add_argument('-k', '--keypoint-file', default=None)
    parser.add_argument('-n', dest='sample_number', type=int, default=0)
    parser.add_argument('-r', '--radius', default=4, type=int)
    parser.add_argument('-o', '--output-dir', default='outputs')
    args = parser.parse_args()

    with h5py.File(args.input_file, 'r') as f:
        name = list(f.keys())[args.sample_number]
        optical = np.asarray(f[name]['optical'])
        thermal = np.asarray(f[name]['thermal']) \
            if 'thermal' in f[name] else optical

    kp_o = kp_t = None
    if args.keypoint_file:
        with h5py.File(args.keypoint_file, 'r') as f:
            grp = f[name]
            if 'keypoints_optical' in grp:
                kp_o = np.asarray(grp['keypoints_optical'])
                kp_t = np.asarray(grp['keypoints_thermal'])
            else:
                kp_o = kp_t = np.asarray(grp['keypoints'])

    os.makedirs(args.output_dir, exist_ok=True)
    panels = []
    for img, kps in ((optical, kp_o), (thermal, kp_t)):
        im = cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8),
                          cv2.COLOR_GRAY2BGR)
        if kps is not None:
            for r, c in kps:
                cv2.circle(im, (int(c), int(r)), args.radius, (0, 255, 0), 1)
        panels.append(im)
    out = np.concatenate(panels, axis=1)
    path = os.path.join(args.output_dir, f'pair_{name}.png')
    cv2.imwrite(path, out)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Visualize exported keypoints on dataset samples (reference
show_keypoints.py)."""
import argparse
import os
import sys

import cv2
import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser(description='Show keypoints on a sample')
parser.add_argument('-d', '--dataset-path', required=True)
parser.add_argument('-k', '--keypoint-file', required=True)
parser.add_argument('-n', dest='sample_number', type=int, default=0)
parser.add_argument('-r', '--radius', default=4, type=int)
parser.add_argument('-o', '--output-dir', default='outputs')
args = parser.parse_args()

with h5py.File(args.dataset_path, 'r') as f:
    name = list(f.keys())[args.sample_number]
    optical = np.asarray(f[name]['optical'])
    thermal = np.asarray(f[name]['thermal']) if 'thermal' in f[name] else optical

with h5py.File(args.keypoint_file, 'r') as f:
    grp = f[name]
    if 'keypoints_optical' in grp:
        kp_o = np.asarray(grp['keypoints_optical'])
        kp_t = np.asarray(grp['keypoints_thermal'])
    else:
        kp_o = kp_t = np.asarray(grp['keypoints'])

os.makedirs(args.output_dir, exist_ok=True)
for label, img, kps in (('optical', optical, kp_o), ('thermal', thermal, kp_t)):
    im = cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8),
                      cv2.COLOR_GRAY2BGR)
    for r, c in kps:
        cv2.circle(im, (int(c), int(r)), args.radius, (0, 255, 0), 1)
    path = os.path.join(args.output_dir, f'show_{label}_{name}.png')
    cv2.imwrite(path, im)
    print(f'wrote {path} ({len(kps)} keypoints)')

"""Generate the deterministic multispectral mini-corpus.

The driver environment has no network access and no released MULTIPOINT
data (cli/download_multipoint_data.py needs egress; reference
download_multipoint_data.py:6-10), so registration metrics (MMA@3px,
h-correctness) are reported on this checked-in-reproducible corpus: 64
synthetic 512x512 optical/pseudo-thermal pairs with a non-trivial
photometric gap (nonlinear intensity remap + IR blur + speckle, mirroring
the reference SyntheticShapes IR processing, synthetic_dataset.py) plus
64 held-out test pairs (test count sets h-correctness granularity — each
pair is 1/64 of the sweep). Regenerate with:

    python tools/make_mini_corpus.py [--out data/mini_corpus]

Pairs are stored in the ImagePairDataset HDF5 layout (one group per
sample with 'optical'/'thermal' float images in [0, 1]).
"""
import argparse
import os
import sys

import numpy as np
import h5py
import cv2

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from xpoint_tpu.data import draw_primitives as dp


GENERATORS = [dp.draw_lines, dp.draw_polygon, dp.draw_multiple_polygons,
              dp.draw_ellipses, dp.draw_star, dp.draw_checkerboard,
              dp.draw_stripes, dp.draw_cube]


def optical_image(rng, shape=(512, 512)):
    # the drawing primitives use the global generators (reference
    # synthetic_dataset parity) — seed them deterministically per image
    import random as _random
    seed = int(rng.integers(2 ** 31))
    _random.seed(seed)
    np.random.seed(seed)
    img = dp.generate_background(shape)
    # 8-12 overlapping primitives per image: real multispectral imagery is
    # texture-dense everywhere, and MAGSAC registration needs enough
    # well-spread correct matches per pair — one primitive per 512^2 image
    # (the round-2 corpus) left pairs with < 10 usable correspondences and
    # pinned h-correctness at 0 regardless of model quality. Density was
    # calibrated with a SIFT+MAGSAC oracle under the committed eval warps
    # (cv2 SIFT, crossCheck BF, USAC_MAGSAC th 2): 4-7 primitives -> SIFT
    # h-corr@3 0.19, 8-12 -> 0.44, 12-18 -> 0.13 (clutter makes matches
    # ambiguous), so 8-12 maximizes registrability headroom
    for _ in range(8 + int(rng.integers(5))):
        gen = GENERATORS[rng.integers(len(GENERATORS))]
        gen(img)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def pseudo_thermal(opt, rng):
    """Nonlinear spectral gap: per-image gamma remap + IR-style blur +
    speckle (a VIS-NIR-like gap). Full contrast INVERSION (VIS-thermal)
    makes registration unlearnable at this corpus scale — the reference
    needs the 36 GB MULTIPOINT corpus for that — and a benchmark pinned at
    zero detects no regressions, so the stand-in stays at a gap a 128-pair
    training run can master."""
    g = 0.5 + 1.1 * rng.uniform()
    t = np.power(opt, g)
    # blur strength: enough to create a real spectral gap without erasing
    # the structures descriptors must anchor to (51x51 at 512^2 left the
    # pseudo-thermal side featureless and the pair task unlearnable;
    # 15x15 capped thermal keypoint LOCALIZATION at ~±3px, which pinned
    # MAGSAC corner error above the 3px correctness threshold for every
    # pair — the benchmark could only move one way). The residual blur
    # level was calibrated with a SIFT+MAGSAC oracle under the committed
    # eval warps: 9x9 capped even SIFT at h-corr@3 = 0.03 (the corpus, not
    # the model, was the ceiling — a benchmark that can't move up), 5x5 ->
    # 0.19, 3x3 -> 0.44, so 3x3 keeps the gap (per-image gamma + blur +
    # speckle) while leaving the registration task achievable enough that
    # h-correctness@3 can land inside (0.2, 0.8) and move BOTH ways
    t = cv2.GaussianBlur(t, (3, 3), 0)
    t = np.clip(t + rng.normal(0, 0.03, t.shape), 0, 1)
    lo, hi = t.min(), t.max()
    return ((t - lo) / max(hi - lo, 1e-6)).astype(np.float32)


def write_split(path, n, rng, shape=(512, 512)):
    with h5py.File(path, 'w') as f:
        for i in range(n):
            opt = optical_image(rng, shape)
            th = pseudo_thermal(opt, rng)
            grp = f.create_group(f"sample_{i:04d}")
            grp.create_dataset('optical', data=opt)
            grp.create_dataset('thermal', data=th)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='data/mini_corpus')
    ap.add_argument('--n-train', type=int, default=64)
    ap.add_argument('--n-test', type=int, default=64)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--splits', choices=('both', 'train', 'test'),
                    default='both',
                    help='which split(s) to (re)write; the splits use '
                         'independent rng seeds (train 0, test 1), so the '
                         'test set can be regenerated or enlarged without '
                         'invalidating training.hdf5 or its HA labels')
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    shape = (args.size, args.size)
    if args.splits in ('both', 'train'):
        write_split(os.path.join(args.out, 'training.hdf5'), args.n_train,
                    np.random.default_rng(0), shape)
    if args.splits in ('both', 'test'):
        write_split(os.path.join(args.out, 'test.hdf5'), args.n_test,
                    np.random.default_rng(1), shape)
    print(f"mini corpus written to {args.out} "
          f"({args.n_train} train / {args.n_test} test pairs @{args.size}, "
          f"splits={args.splits})")


if __name__ == '__main__':
    main()

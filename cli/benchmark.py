#!/usr/bin/env python
"""Full metric sweep + per-stage timing (reference benchmark.py)."""
import argparse
import json
import os

import numpy as np

from _common import load_eval_setup, set_seeds


def main():
    parser = argparse.ArgumentParser(description='Benchmark an XPoint model')
    parser.add_argument('-y', '--yaml-config', default='configs/cipdp.yaml')
    parser.add_argument('-m', '--model-dir', default='model_weights/xpoint')
    parser.add_argument('-v', '--version', default='latest')
    parser.add_argument('-i', '--index', default=None, type=int, nargs='*',
                        help='Sample indices for the timing harness')
    parser.add_argument('-r', '--radius', default=4, type=int)
    parser.add_argument('-p', dest='plot', action='store_true')
    parser.add_argument('-e', dest='evaluation', action='store_true')
    parser.add_argument('-tk', dest='threshold_keypoints', default=4, type=int)
    parser.add_argument('-th', dest='threshold_homography', default=2, type=int)
    parser.add_argument('-s', '--seed', default=0, type=int)
    parser.add_argument('-yv', '--yaml-variable', default=None)
    parser.add_argument('-o', '--output_dir', default='outputs')
    parser.add_argument('--max-samples', default=None, type=int)
    # accepted-but-unused upstream too (reference benchmark.py:40-41 — the
    # metric sweep hardcodes the 1..10 grids, :133-136); kept so existing
    # invocation scripts don't break
    parser.add_argument('-t', dest='threshold', default=3, type=int,
                        help=argparse.SUPPRESS)
    parser.add_argument('-mask', dest='mask', action='store_true',
                        help=argparse.SUPPRESS)
    args = parser.parse_args()
    set_seeds(args.seed)

    config, module, variables, infer, dataset = load_eval_setup(
        args, single_image_override=False)

    from xpoint_tpu.data import DataLoader
    from xpoint_tpu.eval.benchmark import (timing_harness, print_timing,
                                           compute_metrics)

    # ---- timing harness over 5 random samples (reference benchmark.py:141-164)
    indices = args.index
    if not indices:
        rng = np.random.default_rng(args.seed)
        indices = sorted(rng.choice(len(dataset), size=min(5, len(dataset)),
                                    replace=False).tolist())
    times = timing_harness(infer, dataset, indices, config)
    print_timing(times)

    if args.evaluation:
        # threshold grids (reference benchmark.py:133-137)
        threshold_repeatability = list(range(1, 11))
        threshold_keypoints = list(range(1, 11))
        threshold_warp = list(range(1, 11))
        threshold_ransac = [args.threshold_homography]

        ds = dataset
        if args.max_samples:
            class _Sub:
                def __init__(self, d, n):
                    self.d, self.n = d, min(n, len(d))

                def __getitem__(self, i):
                    return self.d[i]

                def __len__(self):
                    return self.n

                def returns_pair(self):
                    return self.d.returns_pair()
            ds = _Sub(dataset, args.max_samples)
        loader = DataLoader(ds, batch_size=1, shuffle=False)
        results = compute_metrics(
            infer, loader, config,
            threshold_repeatability=threshold_repeatability,
            threshold_keypoints=threshold_keypoints,
            threshold_warp=threshold_warp,
            threshold_ransac=threshold_ransac)
        results['timing_seconds'] = {k: list(map(float, v))
                                     for k, v in times.items()}

        print(f"repeatability@3px: {results['repeatability'][3]:.4f}")
        d3 = results['descriptor'][3]
        print(f"NN-mAP@3px: {d3['nn_map']:.4f}  M-score@3px: {d3['m_score']:.4f}")
        h = results['homography'][threshold_ransac[0]]
        print(f"h-correctness@3px: {h['h_correctness']['epsilon_warp_th3']:.4f} "
              f"(avg err {h['average_h_error']:.2f})")

        os.makedirs(args.output_dir, exist_ok=True)
        out_path = os.path.join(
            args.output_dir,
            f"benchmark_{os.path.basename(args.model_dir)}_{args.version}"
            f"_s{args.seed}.json")
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=2, default=float)
        print(f"results written to {out_path}")


if __name__ == '__main__':
    main()

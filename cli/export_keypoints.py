#!/usr/bin/env python
"""Export pseudo-ground-truth keypoints via homographic adaptation
(reference export_keypoints.py): for every dataset pair run the HA
warp->forward->unwarp->aggregate program, NMS + threshold, write keypoint
coordinates to an HDF5 keyed by sample name. Supports -skip resume and -f
periodic backups."""
import argparse
import os
import shutil

import h5py
import numpy as np

from _common import load_eval_setup, set_seeds


def main():
    parser = argparse.ArgumentParser(
        description='Export keypoints via homographic adaptation')
    parser.add_argument('-y', '--yaml-config',
                        default='configs/config_export_keypoints.yaml')
    parser.add_argument('-o', '--output_file', required=True)
    parser.add_argument('-m', '--model-dir', default='model_weights/xpoint')
    parser.add_argument('-v', '--version', default='latest')
    parser.add_argument('-snms', '--single-nms', action='store_true',
                        help='Accepted for reference-CLI compatibility; NMS '
                             'always runs per-sample in this implementation')
    parser.add_argument('-skip', dest='skip_processed', action='store_true')
    parser.add_argument('-f', '--frequency', default=1, type=int,
                        help='Backup the output HDF5 every f batches')
    parser.add_argument('-s', '--seed', default=0, type=int)
    parser.add_argument('--max-samples', default=None, type=int)
    args = parser.parse_args()
    set_seeds(args.seed)

    config, module, variables, infer, dataset = load_eval_setup(
        args, single_image_override=False)

    import jax.numpy as jnp
    from xpoint_tpu.selfsup.homographic_adaptation import (
        make_ha_fn, sample_ha_homographies)
    from xpoint_tpu.ops.detector import prob_from_logits

    ha_cfg = config.get('homographic_adaptation', {})
    pred_cfg = config['prediction']

    def prob_fn(img, is_optical):
        out = module.apply(variables, img,
                           "optical" if is_optical else "thermal")
        return prob_from_logits(out['logits'], module.encoder_downsample_ratio)

    run_ha, merged_ha = make_ha_fn(prob_fn, ha_cfg)
    window_mode = merged_ha['aggregation'] == 'window'

    # resume: collect already-exported sample names (reference :163-169)
    done = set()
    if args.skip_processed and os.path.exists(args.output_file):
        with h5py.File(args.output_file, 'r') as f:
            done = set(f.keys())
        print(f"skipping {len(done)} already-processed samples")

    rng = np.random.default_rng(args.seed)
    n = len(dataset) if args.max_samples is None \
        else min(args.max_samples, len(dataset))

    mode = 'a' if os.path.exists(args.output_file) else 'w'
    with h5py.File(args.output_file, mode) as out_file:
        for idx in range(n):
            name = dataset.get_name(idx)
            if name in done or name in out_file:
                continue
            sample = dataset[idx]
            img_o = np.asarray(sample['optical']['image'])[None]
            img_t = np.asarray(sample['thermal']['image'])[None]

            # masks are derived on device from the homographies: only
            # (num-1) 3x3 matrices cross the host->device link per sample
            Hs, _ = sample_ha_homographies(merged_ha, img_o.shape[1:3], rng,
                                           with_masks=False)
            out = run_ha(jnp.asarray(img_o), jnp.asarray(img_t),
                         jnp.asarray(Hs))

            def extract(prob):
                p = infer.nms(np.asarray(prob))
                return infer.keypoints_from_prob(p[0])

            grp = out_file.create_group(name)
            if window_mode:
                grp.create_dataset('keypoints_optical',
                                   data=extract(out['prob_optical']))
                grp.create_dataset('keypoints_thermal',
                                   data=extract(out['prob_thermal']))
            else:
                grp.create_dataset('keypoints', data=extract(out['prob']))
            out_file.flush()

            if args.frequency and (idx + 1) % max(args.frequency, 1) == 0:
                print(f"[{idx + 1}/{n}] exported {name}", flush=True)
                shutil.copyfile(args.output_file, args.output_file + '.bak')

    print(f"done: keypoints written to {args.output_file}")


if __name__ == '__main__':
    main()

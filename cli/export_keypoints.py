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
    parser.add_argument('--batch', default=None, type=int,
                        help='Samples per HA step; defaults to the device '
                             'count. On a multi-chip mesh the batch is '
                             'sharded across chips (the reference '
                             'DataParallel-wraps its HA warper, '
                             'export_keypoints.py:151-154)')
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

    # multi-chip: shard sample batches over the mesh (each chip runs the
    # full HA program on its shard; outputs identical to single-chip)
    from xpoint_tpu.parallel import make_mesh
    mesh = make_mesh(None)
    n_dev = int(mesh.devices.size)
    batch = args.batch or n_dev
    batch = max(batch // n_dev, 1) * n_dev
    run_ha_sharded = None
    if n_dev > 1 and batch > 1:
        from xpoint_tpu.selfsup.homographic_adaptation import \
            make_sharded_ha_fn

        def make_prob_fn(v):
            def pf(img, is_optical):
                out = module.apply(v, img,
                                   "optical" if is_optical else "thermal")
                return prob_from_logits(out['logits'],
                                        module.encoder_downsample_ratio)
            return pf

        run_ha_sharded, _ = make_sharded_ha_fn(make_prob_fn, ha_cfg, mesh)

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
        pending = [i for i in range(n)
                   if dataset.get_name(i) not in done
                   and dataset.get_name(i) not in out_file]
        pos = 0
        step = 0
        n_done = 0
        while pos < len(pending):
            chunk = pending[pos:pos + batch]
            pos += len(chunk)
            step += 1
            samples = [dataset[i] for i in chunk]
            img_o = np.stack([np.asarray(s['optical']['image'])
                              for s in samples])
            img_t = np.stack([np.asarray(s['thermal']['image'])
                              for s in samples])

            # ONE homography stack per chunk (reference batch semantics:
            # the HA warper applies the same sampled warps to the whole
            # batch); masks derive on device — only (num-1) 3x3 matrices
            # cross the host->device link per chunk
            Hs, _ = sample_ha_homographies(merged_ha, img_o.shape[1:3], rng,
                                           with_masks=False)
            if run_ha_sharded is not None and len(chunk) == batch:
                out = run_ha_sharded(variables, jnp.asarray(img_o),
                                     jnp.asarray(img_t), jnp.asarray(Hs))
            else:
                # remainder (or single-device): unsharded program
                out = run_ha(jnp.asarray(img_o), jnp.asarray(img_t),
                             jnp.asarray(Hs))

            def extract_all(prob):
                p = infer.nms(np.asarray(prob))
                return [infer.keypoints_from_prob(p[b])
                        for b in range(len(chunk))]

            if window_mode:
                kps_o = extract_all(out['prob_optical'])
                kps_t = extract_all(out['prob_thermal'])
            else:
                kps = extract_all(out['prob'])
            for b, i in enumerate(chunk):
                grp = out_file.create_group(dataset.get_name(i))
                if window_mode:
                    grp.create_dataset('keypoints_optical', data=kps_o[b])
                    grp.create_dataset('keypoints_thermal', data=kps_t[b])
                else:
                    grp.create_dataset('keypoints', data=kps[b])
            out_file.flush()
            n_done += len(chunk)

            if args.frequency and step % max(args.frequency, 1) == 0:
                print(f"[{n_done}/{len(pending)}] exported through "
                      f"{dataset.get_name(chunk[-1])}", flush=True)
                shutil.copyfile(args.output_file, args.output_file + '.bak')

    print(f"done: keypoints written to {args.output_file}")


if __name__ == '__main__':
    main()

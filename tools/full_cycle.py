"""Full self-supervised cycle on the deterministic mini-corpus, end to end:

    1. generate the mini corpus (tools/make_mini_corpus.py, seeds fixed),
    2. synthetic-shapes pretrain a detector          (reference train.py),
    3. homographic-adaptation label export      (export_keypoints.py flow),
    4. pair training with descriptors              (cmt.yaml-style config),
    5. registration evaluation                        (benchmark.py -e),

then write the resulting metrics (repeatability / MMA / NN-mAP /
h-correctness sweeps in the reference benchmark.py JSON schema) to
metrics/mini_corpus_metrics.json. The MULTIPOINT corpus is not
downloadable in this environment (zero egress), so this is the committed,
reproducible stand-in for the real-data benchmark:

    python tools/full_cycle.py --work /tmp/cycle

Reference flow being reproduced: README.md Training/Evaluation sections
(synthetic pretrain -> export_keypoints.py -> train.py -> benchmark.py).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


SYNTH_CFG = """
dataset:
    type: 'SyntheticShapes'
    primitives: 'all'
    on-the-fly: false
    hdf5-file: {work}/synthetic.hdf5
    processing:
        blur_size: 21
        additional_ir_blur: true
        additional_ir_blur_size: 51
    augmentation:
        photometric:
            enable: true
            primitives: ['random_brightness', 'random_contrast',
                         'additive_speckle_noise', 'additive_gaussian_noise']
            params:
                random_brightness: {max_abs_change: 0.15}
                random_contrast: {strength_range: [0.3, 1.8]}
                additive_gaussian_noise: {stddev_range: [0, 0.06]}
                additive_speckle_noise: {prob_range: [0, 0.0035]}
        homographic:
            enable: false
model:
    type: 'XPoint'
    multispectral: true
    descriptor_head: false
    final_batchnorm: true
    reflection_pad: true
    takes_pair: false
    homography_regression_head:
        check: false
loss:
    type: 'XPointLoss'
    detector_loss: true
    detector_loss_function: 'cross_entropy'
    detector_handle_multiple_keypoints: 'soft_assignment'
    detector_dustbin_loss_weight: 0.025
    descriptor_loss: false
training:
    batchsize: 16
    learningrate: 1e-3
    n_epochs: {synth_epochs}
    output_directory: {work}/synthetic-pretrain
    save_every_n_epoch: 0
    use_writer: false
"""

EXPORT_CFG = """
dataset:
    type: 'ImagePairDataset'
    filename: {work}/corpus/training.hdf5
    single_image: false
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: false
prediction:
    allow_gpu: true
    num_worker: 0
    batchsize: 1
    detection_threshold: {export_det}
    nms: 4
    reprojection_threshold: 3
homographic_adaptation:
    num: {ha_num}
    aggregation: 'window'
    min_count: 2
    erosion_radius: 5
    mask_border: true
    homographies:
        translation: true
        rotation: true
        scaling: true
        perspective: true
        scaling_amplitude: 0.15
        perspective_amplitude_x: 0.15
        perspective_amplitude_y: 0.15
        patch_ratio: 0.9
        max_angle: 3.14159
        allow_artifacts: true
"""

PAIR_CFG = """
dataset:
    type: 'ImagePairDataset'
    filename: {work}/corpus/training.hdf5
    keypoints_filename: {work}/labels.hdf5
    single_image: false
    random_pairs: false
    height: 256
    width: 256
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: true
            params:
                translation: true
                rotation: true
                scaling: true
                perspective: true
                scaling_amplitude: 0.2
                perspective_amplitude_x: 0.2
                perspective_amplitude_y: 0.2
                patch_ratio: 0.85
                max_angle: 1.57
                allow_artifacts: true
                translation_overflow: 0.05
            valid_border_margin: 0
            border_reflect: true
model:
    type: 'XPoint'
    multispectral: {multispectral}
    descriptor_head: true
    descriptor_size: 256
    intepolation_mode: bilinear
    normalize_descriptors: true
    final_batchnorm: true
    reflection_pad: true
    mixed_precision: true
    takes_pair: true
    # per-spectrum BN running stats: without this, eval-time BN uses one
    # shared running average for both modalities while the separate-forward
    # train step normalized each modality by its own batch stats — measured
    # cross-modal descriptor cosine collapse 0.95 -> 0.33 on the same
    # weights (models/heads.py SpectralBatchNorm)
    spectral_norm_stats: true
    homography_regression_head:
        check: false
loss:
    type: 'XPointLoss'
    detector_loss: true
    detector_loss_function: 'cross_entropy'
    detector_handle_multiple_keypoints: 'soft_assignment'
    detector_dustbin_loss_weight: 0.025
    descriptor_loss: true
    descriptor_loss_threshold: 4.0
    descriptor_loss_use_mask: true
    sparse_descriptor_loss: false
    positive_margin: 1.0
    negative_margin: 0.2
    lambda_d: 250
    lambda: 1.0
    hard_negative_weighting:
        check: {hard_neg_check}
        temperature: {hard_neg_tau}
        weight: {hard_neg_weight}
        keep_uniform: {hard_neg_keep_uniform}
training:
    batchsize: 8
    learningrate: {pair_lr}
    n_epochs: {pair_epochs}
    device_data: {device_data}
    scheduler:
        use_scheduler: {use_sched}
        type: 'StepLR'
        gamma: {sched_gamma}
        step_size: {sched_step}
    output_directory: {work}/pair-train
    save_every_n_epoch: {save_every}
    use_writer: false
"""

EVAL_CFG = """
dataset:
    type: 'ImagePairDataset'
    filename: {work}/corpus/test.hdf5
    keypoints_filename:
    single_image: false
    random_pairs: false
    height: 256
    width: 256
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: true
            params:
                translation: true
                rotation: true
                scaling: true
                perspective: true
                scaling_amplitude: 0.1
                perspective_amplitude_x: 0.05
                perspective_amplitude_y: 0.05
                patch_ratio: 0.90
                max_angle: 1.57
                allow_artifacts: true
                translation_overflow: 0.05
            valid_border_margin: 4
            border_reflect: true
prediction:
    disable_hmhead: true
    allow_gpu: true
    num_worker: 0
    batchsize: 1
    # operating point re-tuned for the round-5 hard-negative-hinge recipe
    # (tools/op_sweep.py grid, docs/ROUND5_NOTES.md): det-threshold is a
    # cliff (h@3 0.72/NN-mAP 0.155 at det 0.003 -> 0.55/0.25 at 0.005,
    # nothing between), but a top-k cap on the NMS survivors trades
    # smoothly — topk 1024 keeps h@3 0.609 (vs SIFT 0.328) while lifting
    # NN-mAP@3 to 0.207 (2x the uncapped 0.162; SIFT 0.276). The
    # registration-max point (topk 0: h@3 0.766) stays documented in the
    # sweep table; the committed point takes the balanced one. subpixel
    # refinement stays off (measured neutral-to-negative on
    # h-correctness: it tightens already-good fits but flips borderline
    # registrations)
    detection_threshold: 0.001
    subpixel: false
    nms: 4
    topk: 1024
    reprojection_threshold: 3
    matching:
        method: bfmatcher
        method_kwargs:
            crossCheck: True
        knn_matches: False
"""


CLASSICAL_MODEL_CFG = """
model:
    type: 'ClassicDetectors'
    method: 'SIFT'
    takes_pair: false
"""


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--work', default='/tmp/cycle')
    ap.add_argument('--n-train', type=int, default=128)
    ap.add_argument('--n-test', type=int, default=64)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--gap', choices=('v1', 'v2'), default='v1',
                    help="corpus spectral gap (make_mini_corpus.py --gap): "
                         "v2 adds dead-leaves backgrounds + partial "
                         "contrast inversion")
    ap.add_argument('--synth-epochs', type=int, default=60)
    ap.add_argument('--synth-samples', type=int, default=1500)
    ap.add_argument('--pair-epochs', type=int, default=600)
    ap.add_argument('--pair-lr', default='3e-4')
    ap.add_argument('--pair-sched-gamma', type=float, default=None,
                    help='enable a StepLR decay on pair training: multiply '
                         'the lr by this factor every --pair-sched-step '
                         'epochs (reference train.py scheduler semantics)')
    ap.add_argument('--pair-sched-step', type=int, default=600)
    ap.add_argument('--save-every', type=int, default=0,
                    help='pair-train checkpoint cadence (e{N} snapshots; '
                         '0 = latest-only) — makes long runs resumable '
                         'across TPU-tunnel drops (cli/train.py --resume)')
    ap.add_argument('--ha-num', type=int, default=50)
    ap.add_argument('--multispectral', action='store_true',
                    help='pair-train with TWO encoders routed by spectrum '
                         '(the reference production mode for real data, '
                         'XPoint.py:284-305) instead of one shared encoder')
    ap.add_argument('--hard-neg-weight', type=float, default=None,
                    help='enable softmax-weighted hard-negative emphasis in '
                         'the descriptor hinge at this weight (extension, '
                         'losses/xpoint_loss.py hard_negative_weighting)')
    ap.add_argument('--hard-neg-tau', type=float, default=0.1)
    ap.add_argument('--hard-neg-replace-uniform', action='store_true',
                    help='drop the reference uniform negative term when '
                         'hard-negative weighting is on')
    ap.add_argument('--export-det', type=float, default=0.015,
                    help='HA-export detection threshold; lower = denser '
                         'labels (the thermal side detects ~3x fewer '
                         'keypoints than optical at the 0.015 default)')
    ap.add_argument('--reuse-synth', default=None,
                    help='path to an existing synthetic-pretrain output dir '
                         '(skips corpus-INDEPENDENT steps 1b/2 — the '
                         'synthetic-shapes detector never sees the pair '
                         'corpus, so reuse is sound when iterating on the '
                         'corpus or pair-training recipe)')
    ap.add_argument('--reuse-labels', action='store_true',
                    help='skip corpus generation + HA export when '
                         '{work}/corpus and {work}/labels.hdf5 already '
                         'exist — sound when iterating only on the '
                         'pair-training recipe (the labels depend on the '
                         'corpus + synth detector, which are unchanged)')
    ap.add_argument('--reuse-model', action='store_true',
                    help='skip pair training when {work}/pair-train already '
                         'holds a checkpoint — regenerates the committed '
                         'metrics (e.g. after an eval operating-point '
                         'change) without the ~20-min retrain')
    ap.add_argument('--reuse-corpus', action='store_true',
                    help='skip corpus generation when {work}/corpus already '
                         'holds both splits (pre-generated on the host '
                         'while the chip was busy) — HA export and pair '
                         'training still run fresh')
    ap.add_argument('--device-data', action='store_true',
                    help='pair training with the corpus resident in HBM and '
                         'augmentation inside the jitted step '
                         '(data/device_dataset.py) — much faster on this '
                         'single-host-core container; different random '
                         'streams than the host path')
    ap.add_argument('--out', default='metrics/mini_corpus_metrics.json')
    ap.add_argument('--classical', action='store_true',
                    help='also run the SIFT ClassicDetectors baseline over '
                         'the identical eval protocol (cv2-host, no '
                         'weights) and write <out>_classical.json')
    ap.add_argument('--require-sensitive', action='store_true',
                    help='fail unless h-correctness@3 (MAGSAC, reproj th 2 '
                         'sweep, evaluation.py:368-393) lands strictly '
                         'inside (0, 1) — i.e. the committed benchmark can '
                         'move in BOTH directions on a regression')
    args = ap.parse_args()
    w = args.work
    os.makedirs(w, exist_ok=True)
    py = sys.executable

    def cfg(tpl, name, **fmt):
        # plain substitution (str.format would choke on YAML flow braces)
        body = tpl.replace('{work}', w)
        for k, v in fmt.items():
            body = body.replace('{%s}' % k, str(v))
        path = os.path.join(w, name)
        with open(path, 'w') as f:
            f.write(body)
        return path

    reuse_labels = (args.reuse_labels
                    and os.path.isdir(f'{w}/corpus')
                    and os.path.exists(f'{w}/labels.hdf5'))
    reuse_corpus = (args.reuse_corpus
                    and os.path.exists(f'{w}/corpus/training.hdf5')
                    and os.path.exists(f'{w}/corpus/test.hdf5'))
    # 1. corpus
    if reuse_labels:
        print(f"+ reusing corpus + labels in {w} "
              f"(regenerating test split at n={args.n_test})", flush=True)
        sh([py, 'tools/make_mini_corpus.py', '--out', f'{w}/corpus',
            '--n-test', str(args.n_test), '--size', str(args.size),
            '--splits', 'test', '--gap', args.gap])
    elif reuse_corpus:
        print(f"+ reusing pre-generated corpus in {w}/corpus", flush=True)
    else:
        sh([py, 'tools/make_mini_corpus.py', '--out', f'{w}/corpus',
            '--n-train', str(args.n_train), '--n-test', str(args.n_test),
            '--size', str(args.size), '--gap', args.gap])
    synth_dir = args.reuse_synth or f'{w}/synthetic-pretrain'
    # 1b. pre-generate the synthetic-shapes set once (on-the-fly generation
    # costs ~100 ms/sample on the host — regenerating every epoch would
    # dominate the whole cycle; cached HDF5 keeps only the cheap
    # photometric augmentation per epoch)
    if not args.reuse_synth and not os.path.exists(f'{w}/synthetic.hdf5'):
        pregen = (
            "import h5py, numpy as np, random;"
            "from xpoint_tpu.data.synthetic_shapes import SyntheticShapes;"
            "random.seed(0); np.random.seed(0);"
            "ds = SyntheticShapes({'primitives': 'all'});"
            "f = h5py.File(%r, 'w');\n"
            "for i in range(%d):\n"
            "    img, kp, _ = ds.generate_synthetic_image(i)\n"
            "    g = f.create_group('s%%05d' %% i)\n"
            "    g.create_dataset('image', data=(img * 255).astype('uint8'))\n"
            "    g.create_dataset('points', data=np.asarray(kp, 'float32'))\n"
            "f.close()" % (f'{w}/synthetic.hdf5', args.synth_samples))
        sh([py, '-c', pregen])
    # 2. synthetic pretrain
    if args.reuse_synth:
        print(f"+ reusing synthetic pretrain from {synth_dir}", flush=True)
    else:
        sh([py, 'cli/train.py', '-y',
            cfg(SYNTH_CFG, 'synth.yaml', synth_epochs=args.synth_epochs)])
    # 3. HA label export
    if not reuse_labels:
        sh([py, 'cli/export_keypoints.py', '-y',
            cfg(EXPORT_CFG, 'export.yaml', ha_num=args.ha_num,
                export_det=args.export_det),
            '-o', f'{w}/labels.hdf5', '-m', synth_dir])
    # 4. pair training
    if args.reuse_model and os.path.exists(f'{w}/pair-train/latest.ckpt'):
        print(f"+ reusing trained pair model in {w}/pair-train", flush=True)
    else:
        sh([py, 'cli/train.py', '-y',
            cfg(PAIR_CFG, 'pair.yaml', pair_epochs=args.pair_epochs,
                pair_lr=args.pair_lr,
                use_sched=str(args.pair_sched_gamma is not None).lower(),
                sched_gamma=(args.pair_sched_gamma
                             if args.pair_sched_gamma is not None else 1.0),
                sched_step=args.pair_sched_step,
                device_data=str(bool(args.device_data)).lower(),
                multispectral=str(bool(args.multispectral)).lower(),
                hard_neg_check=str(args.hard_neg_weight is not None).lower(),
                hard_neg_tau=args.hard_neg_tau,
                hard_neg_weight=(args.hard_neg_weight
                                 if args.hard_neg_weight is not None else 0.0),
                hard_neg_keep_uniform=str(
                    not args.hard_neg_replace_uniform).lower(),
                save_every=args.save_every)])
    # 5. evaluation sweep (reference benchmark.py -e JSON schema)
    sh([py, 'cli/benchmark.py', '-y', cfg(EVAL_CFG, 'eval.yaml'),
        '-m', f'{w}/pair-train', '-e', '-o', f'{w}/outputs'])

    # 5a. classical baseline over the SAME protocol (same test split, same
    # seed-0 warp draws, same prediction operating point, `-v none` model
    # construction like reference benchmark.py:93-96): calibrates corpus
    # difficulty and anchors the learned model's numbers against SIFT
    if args.classical:
        sh([py, 'cli/benchmark.py', '-y',
            cfg(EVAL_CFG + CLASSICAL_MODEL_CFG, 'eval_classical.yaml'),
            '-m', 'none', '-v', 'none', '-e', '-o', f'{w}/outputs_classical'])
        outs_cls = sorted(
            (os.path.join(r, f)
             for r, _, fs in os.walk(f'{w}/outputs_classical')
             for f in fs if f.endswith('.json')), key=os.path.getmtime)
        if outs_cls:
            cls_out = os.path.join(
                REPO, args.out.replace('.json', '_classical.json'))
            os.makedirs(os.path.dirname(cls_out), exist_ok=True)
            with open(outs_cls[-1]) as f_in, open(cls_out, 'w') as f_out:
                f_out.write(f_in.read())
            print(f"classical baseline written to {cls_out}", flush=True)

    # 5b. second homography sweep with the on-device estimator
    # (prediction: h_estimator: device) — same seeded warp draws, so the
    # two curves are directly comparable; recorded under
    # 'homography_device' next to the MAGSAC parity curve
    sh([py, 'cli/benchmark.py', '-y',
        cfg(EVAL_CFG.replace('prediction:\n',
                             'prediction:\n    h_estimator: device\n'),
            'eval_device.yaml'),
        '-m', f'{w}/pair-train', '-e', '-o', f'{w}/outputs_device'])

    # collect the newest results JSON
    outs = sorted(
        (os.path.join(r, f) for r, _, fs in os.walk(f'{w}/outputs')
         for f in fs if f.endswith('.json')), key=os.path.getmtime)
    assert outs, "benchmark produced no JSON"
    os.makedirs(os.path.dirname(os.path.join(REPO, args.out)), exist_ok=True)
    with open(outs[-1]) as f:
        res = json.load(f)
    outs_dev = sorted(
        (os.path.join(r, f) for r, _, fs in os.walk(f'{w}/outputs_device')
         for f in fs if f.endswith('.json')), key=os.path.getmtime)
    if outs_dev:
        with open(outs_dev[-1]) as f:
            res['homography_device'] = json.load(f).get('homography', {})
    with open(os.path.join(REPO, args.out), 'w') as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in list(res)[:12]}, indent=1)[:2000])
    print(f"metrics written to {args.out}", flush=True)

    hc3 = (res.get('homography', {}).get('2', {})
           .get('h_correctness', {}).get('epsilon_warp_th3'))
    print(f"h-correctness@3px (MAGSAC, reproj th 2): {hc3}", flush=True)
    hc3_dev = (res.get('homography_device', {}).get('2', {})
               .get('h_correctness', {}).get('epsilon_warp_th3'))
    print(f"h-correctness@3px (device RANSAC, reproj th 2): {hc3_dev}",
          flush=True)
    if args.require_sensitive:
        assert hc3 is not None and 0.0 < hc3 < 1.0, (
            f"registration benchmark is not sensitive: h-correctness@3 = "
            f"{hc3} (must be strictly inside (0, 1) so regressions can "
            f"move it)")


if __name__ == '__main__':
    main()

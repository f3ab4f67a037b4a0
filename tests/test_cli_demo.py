"""End-to-end demo CLI: the reference demo.py metric-report surface
(per-stage runtime, keypoint counts, matching score, homography inliers,
repeatability vs the estimated H, alignment overlay — demo.py:153-377)."""
import importlib.util
import json
import os
import sys

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_model_dir(tmp_path):
    import optax
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.config import save_yaml
    from xpoint_tpu.parallel import TrainState
    from xpoint_tpu import checkpoints as ckpt

    cfg = {'type': 'XPoint', 'multispectral': False, 'takes_pair': True,
           'channel_version': 2, 'descriptor_size': 16,
           'homography_regression_head': {'check': False}}
    module, mcfg = build_xpoint(cfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                            method=module.init_all)
    mdir = tmp_path / 'model'
    mdir.mkdir()
    save_yaml({'model': mcfg}, str(mdir / 'params.yaml'))
    state = TrainState.create(variables['params'],
                              variables.get('batch_stats'), optax.adam(1e-3))
    ckpt.save(str(mdir), state, 'latest', 1)
    return str(mdir)


def test_demo_metric_report(tmp_path, capsys):
    rng = np.random.default_rng(3)
    img = (rng.uniform(size=(96, 96)) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    vis_path = str(tmp_path / 'vis.png')
    oth_path = str(tmp_path / 'oth.png')
    cv2.imwrite(vis_path, img)
    # slight translation: registration is recoverable
    M = np.float32([[1, 0, 2], [0, 1, -1]])
    cv2.imwrite(oth_path, cv2.warpAffine(img, M, (96, 96)))

    mdir = _make_model_dir(tmp_path)
    cfg_path = str(tmp_path / 'demo.yaml')
    with open(cfg_path, 'w') as f:
        f.write("prediction:\n  nms: 4\n  detection_threshold: 0.0001\n"
                "  reprojection_threshold: 3\n")

    spec = importlib.util.spec_from_file_location(
        'xdemo', os.path.join(REPO, 'cli', 'demo.py'))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    out_dir = str(tmp_path / 'out')
    argv = ['demo.py', '--visible', vis_path, '--other', oth_path,
            '--config', cfg_path, '--model-dir', mdir, '--output', out_dir,
            '--plot']
    old = sys.argv
    sys.argv = argv
    try:
        demo.main()
    finally:
        sys.argv = old

    out = capsys.readouterr().out
    # the reference print_metrics block, line for line (demo.py:352-377)
    for line in ["=== Performance Metrics ===", "Runtime Metrics:",
                 "Forward pass time:", "Keypoint detection time:",
                 "Descriptor computation time:", "Matching time:",
                 "Number of visible keypoints:", "Matching score:",
                 "Homography estimated:", "Inlier ratio:",
                 "Number of inliers:", "Repeatability score:"]:
        assert line in out, line
    assert os.path.exists(os.path.join(out_dir, 'matches.png'))
    assert os.path.exists(os.path.join(out_dir, 'metrics.json'))
    with open(os.path.join(out_dir, 'metrics.json')) as f:
        metrics = json.load(f)
    for key in ('runtime', 'keypoints', 'matching_score', 'homography',
                'repeatability'):
        assert key in metrics, key
    if metrics['homography']['estimated']:
        assert os.path.exists(os.path.join(out_dir, 'alignment.png'))
        assert os.path.exists(os.path.join(out_dir,
                                           'registered_checkerboard.png'))
        assert len(metrics['homography']['matrix']) == 3


def test_demo_repeatability_formula():
    """compute_repeatability matches the reference formula
    (demo.py:183-220) on a hand-checked case."""
    spec = importlib.util.spec_from_file_location(
        'xdemo2', os.path.join(REPO, 'cli', 'demo.py'))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    kp_v = np.array([[10, 20], [40, 50], [80, 90]], np.float32)  # (row, col)
    H_est = np.array([[1, 0, 3], [0, 1, -2], [0, 0, 1]], np.float64)
    # warped (col+3, row-2) -> (row-2, col+3): [8,23],[38,53],[78,93]
    kp_o = np.array([[8, 23], [38, 52], [0, 0]], np.float32)
    rep = demo.compute_repeatability(kp_v, kp_o, H_est, (96, 96),
                                     distance_thresh=3)
    # kp 0 exact, kp 1 at distance 1, kp 2 nearest is far -> 2/3
    assert rep == pytest.approx(2 / 3)

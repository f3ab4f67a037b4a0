"""CPU smoke tests for the CLI surface (SURVEY 2.28 parity: the reference's
root scripts). Each entry point runs end to end on tiny data in a
subprocess with the reference's flags, so argument plumbing, config
loading, model resolution, and output writing are all pinned — the demo
CLI has its own metric tests in test_cli_demo.py; the benchmark CLI is
exercised by tools/full_cycle.py."""
import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# PYTHONPATH= : keep the axon PJRT plugin out of subprocesses (tests are
# CPU-only and must not hang when the TPU tunnel is down — see the verify
# skill); the repo stays importable via the site-packages .pth
ENV = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
           # share the suite's persistent compilation cache (conftest.py):
           # each CLI subprocess otherwise re-pays its XLA-CPU compiles
           XPOINT_JAX_CACHE=os.environ.get("XPOINT_JAX_CACHE",
                                           "/tmp/xpoint_jax_cache"))
# the suite conftest forces an 8-device virtual mesh; CLIs here should see
# a plain single-device environment like a user's shell
ENV.pop("XLA_FLAGS", None)


def run_cli(script, *args, timeout=600):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=ENV)
    assert r.returncode == 0, (script, r.stdout[-2000:], r.stderr[-2000:])
    return r


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    """2+2-pair 64^2 corpus in the committed generator's exact format."""
    d = tmp_path_factory.mktemp("corpus")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_mini_corpus.py"),
         "--out", str(d), "--n-train", "2", "--n-test", "2", "--size", "64"],
        check=True, cwd=REPO, env=ENV, capture_output=True, timeout=300)
    return d


@pytest.fixture(scope="module")
def tiny_kp_file(tiny_corpus, tmp_path_factory):
    kp_path = tmp_path_factory.mktemp("kp") / "labels.hdf5"
    rng = np.random.default_rng(0)
    with h5py.File(tiny_corpus / "test.hdf5", "r") as src, \
            h5py.File(kp_path, "w") as dst:
        for name in src:
            g = dst.create_group(name)
            g.create_dataset("keypoints_optical",
                             data=rng.integers(0, 64, (12, 2)).astype("f8"))
            g.create_dataset("keypoints_thermal",
                             data=rng.integers(0, 64, (12, 2)).astype("f8"))
    return kp_path


def test_show_image_pair_sample_cli(tiny_corpus, tiny_kp_file, tmp_path):
    run_cli("show_image_pair_sample.py",
            "-i", str(tiny_corpus / "test.hdf5"),
            "-k", str(tiny_kp_file), "-n", "0", "-o", str(tmp_path),
            timeout=120)
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_show_keypoints_cli(tiny_corpus, tiny_kp_file, tmp_path):
    run_cli("show_keypoints.py",
            "-d", str(tiny_corpus / "test.hdf5"),
            "-k", str(tiny_kp_file), "-n", "1", "-o", str(tmp_path),
            timeout=120)
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_show_synthetic_images_cli(tmp_path):
    run_cli("show_synthetic_images.py", "-n", "2", "-o", str(tmp_path),
            timeout=180)
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".png")]) >= 2


def test_download_cli_skips_existing_files(tmp_path):
    """The resume contract (reference download_multipoint_data.py): an
    existing target short-circuits without touching the network."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "xdl", os.path.join(REPO, "cli", "download_multipoint_data.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    target = tmp_path / "test.hdf5"
    target.write_bytes(b"existing")
    out = mod.download("http://unreachable.invalid/test.hdf5", str(tmp_path))
    assert out == str(target) and target.read_bytes() == b"existing"


def test_benchmark_classical_baseline_cli(tiny_corpus, tmp_path):
    """cli/benchmark.py -v none with model.type ClassicDetectors: the
    reference benchmarks SIFT/LGHD through the same script with weight
    loading skipped (benchmark.py:93-96); full sweep on 2 tiny pairs."""
    import json
    eval_yaml = tmp_path / "classical.yaml"
    eval_yaml.write_text(f"""
dataset:
    type: 'ImagePairDataset'
    filename: {tiny_corpus / 'test.hdf5'}
    single_image: false
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
            valid_border_margin: 2
            border_reflect: true
model:
    type: 'ClassicDetectors'
    method: 'SIFT'
    takes_pair: false
prediction:
    allow_gpu: true
    num_worker: 0
    batchsize: 1
    detection_threshold: 0.005
    nms: 4
    topk: 0
    reprojection_threshold: 3
    matching:
        method: bfmatcher
        method_kwargs:
            crossCheck: True
        knn_matches: False
""")
    run_cli("benchmark.py", "-y", str(eval_yaml), "-m", "none", "-v", "none",
            "-e", "-o", str(tmp_path / "out"), timeout=600)
    outs = [f for f in os.listdir(tmp_path / "out") if f.endswith(".json")]
    assert outs
    with open(tmp_path / "out" / outs[0]) as f:
        res = json.load(f)
    assert set(res) >= {"repeatability", "descriptor", "homography",
                        "n_kp_optical", "n_kp_thermal"}
    # SIFT must actually fire on the drawn-primitive images
    assert sum(res["n_kp_optical"]) > 0


FIXTURE = os.path.join(REPO, "tests", "data", "multipoint_micro.hdf5")


def test_multipoint_fixture_layout_matches_reference_loader():
    """The committed micro-fixture must be read byte-identically by the
    ACTUAL reference loader (ImagePairDataset.py:184-197) and by ours —
    including the thermal_raw selection and the optical-only fallback
    (thermal = optical.copy()) — so the day the real MULTIPOINT corpus
    lands, nothing in the data path needs debugging."""
    from reference_oracle import get_reference
    ref = get_reference()
    from xpoint.datasets.ImagePairDataset import ImagePairDataset as RefDS
    from xpoint_tpu.data.image_pair import ImagePairDataset as OurDS

    for raw in (False, True):
        cfg = {"filename": FIXTURE, "single_image": False,
               "raw_thermal": raw, "height": -1, "width": -1,
               "augmentation": {"photometric": {"enable": False},
                                "homographic": {"enable": False}}}
        rds = RefDS(dict(cfg))
        ods = OurDS(dict(cfg))
        assert rds.memberslist == ods.memberslist
        for i, name in enumerate(rds.memberslist):
            if raw and "thermal_raw" not in h5py.File(FIXTURE)[name] \
                    and "thermal" in h5py.File(FIXTURE)[name]:
                continue        # both loaders would KeyError identically
            r = rds[i]
            o = ods[i]
            # reference emits (1, H, W) torch tensors; ours (H, W, 1) numpy
            np.testing.assert_array_equal(
                np.asarray(r["optical"]["image"])[0],
                o["optical"]["image"][..., 0], err_msg=f"{name} optical")
            np.testing.assert_array_equal(
                np.asarray(r["thermal"]["image"])[0],
                o["thermal"]["image"][..., 0], err_msg=f"{name} thermal")
    del ref


@pytest.mark.slow
def test_multipoint_fixture_export_train_benchmark_chain(tmp_path):
    """Reference workflow (README Training/Evaluation) against the
    MULTIPOINT-layout fixture: HA label export -> pair training with the
    exported labels -> registration benchmark, all through the CLIs."""
    import json
    model_block = """
model:
    type: 'XPoint'
    multispectral: false
    descriptor_head: true
    descriptor_size: 32
    channel_version: 2
    takes_pair: true
    spectral_norm_stats: true
    homography_regression_head:
        check: false
"""
    export_yaml = tmp_path / "export.yaml"
    export_yaml.write_text(f"""
dataset:
    type: 'ImagePairDataset'
    filename: {FIXTURE}
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
    detection_threshold: 0.015
    nms: 4
    reprojection_threshold: 3
homographic_adaptation:
    num: 2
    aggregation: 'window'
    min_count: 1
    erosion_radius: 2
    mask_border: true
    homographies:
        translation: true
        rotation: true
        scaling: true
        perspective: true
""" + model_block)
    labels = tmp_path / "labels.hdf5"
    run_cli("export_keypoints.py", "-y", str(export_yaml),
            "-o", str(labels), "-m", "none", "-v", "none")
    with h5py.File(labels) as lf:
        assert set(lf.keys()) == {"1566481721_4806340", "1566481725_1093750",
                                  "1566481719_0312500"}
        for g in lf.values():
            assert "keypoints_optical" in g and "keypoints_thermal" in g

    train_yaml = tmp_path / "train.yaml"
    train_yaml.write_text(f"""
dataset:
    type: 'ImagePairDataset'
    filename: {FIXTURE}
    keypoints_filename: {labels}
    single_image: false
    random_pairs: false
    height: 64
    width: 64
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: true
            params:
                translation: true
                rotation: true
            valid_border_margin: 0
            border_reflect: true
""" + model_block + f"""
loss:
    type: 'XPointLoss'
    detector_loss: true
    detector_loss_function: 'cross_entropy'
    detector_handle_multiple_keypoints: 'soft_assignment'
    descriptor_loss: true
    descriptor_loss_threshold: 4.0
    lambda: 1.0
training:
    batchsize: 3
    learningrate: 1e-3
    n_epochs: 1
    output_directory: {tmp_path / 'model'}
    save_every_n_epoch: 0
    use_writer: false
""")
    run_cli("train.py", "-y", str(train_yaml))
    assert (tmp_path / "model" / "latest.ckpt").exists()

    eval_yaml = tmp_path / "eval.yaml"
    eval_yaml.write_text(f"""
dataset:
    type: 'ImagePairDataset'
    filename: {FIXTURE}
    single_image: false
    random_pairs: false
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: true
            params:
                translation: true
                rotation: true
            valid_border_margin: 2
            border_reflect: true
prediction:
    disable_hmhead: true
    num_worker: 0
    batchsize: 1
    detection_threshold: 0.005
    nms: 4
    topk: 0
    reprojection_threshold: 3
    matching:
        method: bfmatcher
        method_kwargs:
            crossCheck: True
        knn_matches: False
""")
    run_cli("benchmark.py", "-y", str(eval_yaml),
            "-m", str(tmp_path / "model"), "-e",
            "-o", str(tmp_path / "out"))
    outs = [f for f in os.listdir(tmp_path / "out") if f.endswith(".json")]
    assert outs
    with open(tmp_path / "out" / outs[0]) as f:
        res = json.load(f)
    assert set(res) >= {"repeatability", "descriptor", "homography"}


@pytest.mark.slow
def test_train_predict_align_cli_chain(tiny_corpus, tmp_path):
    """cli/train.py -> cli/predict_keypoints.py -> cli/predict_align
    on tiny data: the full config/params.yaml/checkpoint contract."""
    train_yaml = tmp_path / "train.yaml"
    train_yaml.write_text(f"""
dataset:
    type: 'SyntheticShapes'
    length: 8
    generation_size: [120, 160]
    image_size: [64, 64]
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: false
model:
    type: 'XPoint'
    multispectral: true
    descriptor_head: true
    descriptor_size: 32
    takes_pair: false
    homography_regression_head:
        check: false
loss:
    type: 'XPointLoss'
    detector_loss: true
    detector_loss_function: 'cross_entropy'
    detector_handle_multiple_keypoints: 'soft_assignment'
    descriptor_loss: false
training:
    batchsize: 4
    learningrate: 1e-3
    n_epochs: 1
    output_directory: {tmp_path / 'model'}
    save_every_n_epoch: 0
    use_writer: false
""")
    run_cli("train.py", "-y", str(train_yaml))
    assert (tmp_path / "model" / "params.yaml").exists()
    assert (tmp_path / "model" / "latest.ckpt").exists()

    pred_yaml = tmp_path / "pred.yaml"
    pred_yaml.write_text(f"""
dataset:
    type: 'ImagePairDataset'
    filename: {tiny_corpus / 'test.hdf5'}
    single_image: false
    random_pairs: false
    augmentation:
        photometric:
            enable: false
        homographic:
            enable: false
prediction:
    disable_hmhead: true
    detection_threshold: 0.015
    nms: 8
    reprojection_threshold: 3
    matching:
        method: 'bfmatcher'
        method_kwargs:
            crossCheck: True
        knn_matches: False
""")
    out_kp = tmp_path / "out_kp"
    run_cli("predict_keypoints.py", "-y", str(pred_yaml),
            "-m", str(tmp_path / "model"), "-i", "0", "-o", str(out_kp))
    out_al = tmp_path / "out_align"
    r = run_cli("predict_align_image_pair.py", "-y", str(pred_yaml),
                "-m", str(tmp_path / "model"), "-i", "0", "-o", str(out_al))
    assert "keypoints:" in r.stdout

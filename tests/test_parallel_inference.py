"""Mesh-sharded inference parity: the data-parallel serving pipeline
(eval/pipeline.py::make_sharded_pair_pipeline) must reproduce the
single-device fused pipeline per sample — the TPU-native analog of the
reference's DataParallel scatter/gather being output-equivalent to a
single-GPU forward (export_keypoints.py:151-154)."""
import numpy as np

import jax
import jax.numpy as jnp

from xpoint_tpu.models import build_xpoint
from xpoint_tpu.eval import make_pair_pipeline, make_sharded_pair_pipeline
from xpoint_tpu.parallel import make_mesh


def _tiny_model():
    module, _ = build_xpoint({
        'multispectral': False, 'takes_pair': True, 'channel_version': 2,
        'descriptor_size': 32,
        'homography_regression_head': {'check': False}})
    img = jnp.zeros((1, 64, 64, 1))
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    return module, variables


def test_sharded_pipeline_matches_single_device():
    module, variables = _tiny_model()
    mesh = make_mesh(8)
    kw = dict(k=64, nms_size=4, detection_threshold=1e-4)
    single = make_pair_pipeline(module, (64, 64), **kw)
    sharded = make_sharded_pair_pipeline(module, (64, 64), mesh, **kw)

    rng = np.random.default_rng(3)
    img_o = rng.uniform(size=(8, 64, 64, 1)).astype(np.float32)
    img_t = rng.uniform(size=(8, 64, 64, 1)).astype(np.float32)

    ref = single(variables, jnp.asarray(img_o), jnp.asarray(img_t))
    out = sharded(variables, img_o, img_t)

    # outputs stay batch-sharded over the mesh until fetched
    shard_axes = out["prob_optical"].sharding.spec
    assert shard_axes[0] == "data", shard_axes

    # integer/bool outputs must agree exactly; float maps to fp tolerance
    # (GSPMD picks different fusions than the single program)
    for key in ("keypoints_optical", "keypoints_thermal",
                "mask_optical", "mask_thermal", "match_idx", "matched"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    for key in ("prob_optical", "prob_thermal", "desc_optical",
                "desc_thermal", "match_dist"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   atol=1e-5, rtol=1e-5, err_msg=key)


def test_sharded_pipeline_no_collectives():
    """The serving pipeline's claim (eval/pipeline.py): every stage is
    per-sample and runs under shard_map, so the compiled program has ZERO
    cross-chip collectives. Audit the compiled HLO so a regression (an
    accidental batch-axis reduction, an explicit collective, or a fall
    back to GSPMD partitioning — which inserts an all-reduce per NMS
    while-iteration and all-gathers around TopK) fails loudly instead of
    silently serializing the mesh."""
    module, variables = _tiny_model()
    mesh = make_mesh(8)
    sharded = make_sharded_pair_pipeline(module, (64, 64), mesh, k=64,
                                         nms_size=4,
                                         detection_threshold=1e-4)

    img = jax.device_put(
        jnp.zeros((8, 64, 64, 1), jnp.float32), sharded.data_sharding)
    variables = jax.tree.map(
        lambda x: jax.device_put(x, sharded.replicated_sharding), variables)
    keys = jax.device_put(jax.random.split(jax.random.PRNGKey(0), 8),
                          sharded.data_sharding)
    hlo = (sharded.sharded_program.lower(variables, img, img, keys)
           .compile().as_text())

    banned = ("all-reduce", "all-gather", "collective-permute",
              "reduce-scatter", "all-to-all")
    hits = [b for b in banned if b in hlo]
    assert not hits, (
        f"sharded serving pipeline compiled with cross-chip collectives "
        f"{hits} — the per-sample partitioning claim is broken")


def test_sharded_pipeline_with_ransac():
    """The on-device registration tail (batched DLT+RANSAC) shards with
    the rest of the program. An identity pair (thermal == optical) makes
    every MNN match an exact correspondence, so any 4-point hypothesis
    fits H ~= I: the estimate is insensitive to which hypothesis wins and
    the sharded program must agree with the single-device one. (Random
    unrelated images would tie RANSAC scores on garbage matches and let
    compilation-dependent fp noise flip the argmax.)"""
    module, variables = _tiny_model()
    mesh = make_mesh(8)
    kw = dict(k=64, nms_size=4, detection_threshold=1e-4,
              estimate_homography=True, ransac_iters=32)
    single = make_pair_pipeline(module, (64, 64), **kw)
    sharded = make_sharded_pair_pipeline(module, (64, 64), mesh, **kw)

    rng = np.random.default_rng(7)
    img_o = rng.uniform(size=(8, 64, 64, 1)).astype(np.float32)
    key = jax.random.PRNGKey(11)

    ref = single(variables, jnp.asarray(img_o), jnp.asarray(img_o), key)
    out = sharded(variables, img_o, img_o, key)

    assert out["H_est"].shape == (8, 3, 3)
    np.testing.assert_array_equal(np.asarray(out["ransac_n_inliers"]),
                                  np.asarray(ref["ransac_n_inliers"]))
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (8, 3, 3))
    np.testing.assert_allclose(np.asarray(ref["H_est"]), eye, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["H_est"]),
                               np.asarray(ref["H_est"]),
                               atol=1e-4, rtol=1e-3)

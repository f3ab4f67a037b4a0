"""Fused inference pipeline: the BASELINE.json north-star program.

One jit-compiled XLA program per image pair covering
    forward(optical) + forward(thermal) -> cell softmax + PixelShuffle ->
    box-NMS -> top-k keypoints -> descriptor bilinear sampling -> MNN match.
The reference runs this as separate GPU kernels with host round-trips
(predict_align_image_pair.py:177-210, benchmark_evaluation.py:16-134);
here the whole detect+describe+match chain stays on device.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.detector import prob_from_logits
from ..ops.nms import box_nms, box_nms_extract
from ..ops.descriptor import interpolate_descriptors
from ..ops.matching import mnn_match


def make_pair_pipeline(module, image_shape, k=1024, nms_size=8,
                       detection_threshold=0.015, iou=0.1,
                       match_threshold=None, cross_check=True,
                       max_candidates=4096, ratio=8,
                       estimate_homography=False, ransac_iters=512,
                       ransac_threshold=3.0):
    """Returns jitted fn(variables, img_o, img_t[, rng]) -> device arrays.

    Images: (B, H, W, 1). All outputs fixed-size with validity masks.
    With estimate_homography=True the registration homography is fitted
    on-device too (batched DLT + RANSAC, geometry/ransac.py) and the output
    gains 'H_est' (B, 3, 3), 'ransac_inliers', 'ransac_score'.
    """
    H, W = image_shape
    if estimate_homography:
        from ..geometry.ransac import ransac_homography

    @partial(jax.jit, static_argnames=())
    def run(variables, img_o, img_t, rng=None):
        pred_o = module.apply(variables, img_o, "optical")
        pred_t = module.apply(variables, img_t, "thermal")

        prob_o = prob_from_logits(pred_o["logits"], ratio)     # (B, H, W)
        prob_t = prob_from_logits(pred_t["logits"], ratio)

        nmsx = partial(box_nms_extract, size=nms_size,
                       min_prob=detection_threshold, iou=iou, k=k,
                       max_candidates=max_candidates)
        kps_o, sc_o, m_o = jax.vmap(lambda p: nmsx(p))(prob_o)
        kps_t, sc_t, m_t = jax.vmap(lambda p: nmsx(p))(prob_t)

        interp = partial(interpolate_descriptors, image_shape=(H, W))
        d_o = jax.vmap(interp)(kps_o.astype(jnp.float32), pred_o["desc"])
        d_t = jax.vmap(interp)(kps_t.astype(jnp.float32), pred_t["desc"])

        match = partial(mnn_match, threshold=match_threshold,
                        cross_check=cross_check)
        idx2, dist, matched = jax.vmap(match)(d_o, d_t, m_o, m_t)

        extra = {}
        if estimate_homography:
            r = rng if rng is not None else jax.random.PRNGKey(0)
            # accept either one key (split per sample here) or pre-split
            # per-sample keys (B, 2) — the sharded wrapper pre-splits so
            # each mesh shard consumes exactly the keys the single-device
            # program would have used for its samples
            keys = r if r.ndim == 2 else jax.random.split(r, kps_o.shape[0])
            # matched point pairs in (x, y): query kp -> its NN in thermal
            p1 = jnp.flip(kps_o.astype(jnp.float32), -1)
            p2 = jnp.flip(jnp.take_along_axis(
                kps_t.astype(jnp.float32), idx2[..., None], axis=1), -1)
            # match distances double as the PROSAC quality prior
            out_r = jax.vmap(
                lambda a, b, m, k, q: ransac_homography(
                    a, b, m, k, threshold=ransac_threshold,
                    n_iters=ransac_iters, quality=q))(
                p1, p2, matched, keys, dist)
            extra = {"H_est": out_r["H"], "ransac_inliers": out_r["inliers"],
                     "ransac_score": out_r["score"],
                     "ransac_n_inliers": out_r["n_inliers"]}

        return {
            **extra,
            "prob_optical": prob_o, "prob_thermal": prob_t,
            "keypoints_optical": kps_o, "keypoints_thermal": kps_t,
            "scores_optical": sc_o, "scores_thermal": sc_t,
            "mask_optical": m_o, "mask_thermal": m_t,
            "desc_optical": d_o, "desc_thermal": d_t,
            "match_idx": idx2, "match_dist": dist, "matched": matched,
        }

    return run


def make_sharded_pair_pipeline(module, image_shape, mesh, **kw):
    """Data-parallel inference/serving over a device mesh.

    The reference's only inference parallelism is torch DataParallel
    scatter/gather (export_keypoints.py:151-154). Here the SAME fused
    program as make_pair_pipeline runs under shard_map: each device
    executes the single-device program on its local batch slice, so
    cross-chip collectives are impossible BY CONSTRUCTION — not just by
    GSPMD's grace. (Letting GSPMD partition the jit program instead was
    measured to insert an all-reduce per NMS while-iteration — a global
    loop-exit agreement — plus all-gathers around the unpartitionable
    TopK custom-call; shard_map keeps the NMS fixed-point loop and top-k
    local to each shard. Guarded by
    tests/test_parallel_inference.py::test_sharded_pipeline_no_collectives.)

    Returns fn(variables, img_o, img_t[, rng]). The batch size must be a
    multiple of the mesh size. Variables are replicated and inputs
    batch-sharded on entry (a no-op for arrays already placed, so
    repeated calls pay no re-transfer). RANSAC keys are pre-split per
    sample, so per-sample outputs are identical to the single-device
    program.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    from ..parallel.mesh import DATA_AXIS

    base = make_pair_pipeline(module, image_shape, **kw)
    P = PartitionSpec
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    # check_vma=False: the varying-manual-axes analysis rejects lax.scan
    # carries initialized from unvarying constants (the VSSM selective-scan
    # h0), which is sound here — every output is per-sample by out_specs
    local = jax.shard_map(
        lambda v, a, b, keys: base(v, a, b, keys),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False)
    sharded_program = jax.jit(local)

    def run(variables, img_o, img_t, rng=None):
        variables = jax.tree.map(lambda x: jax.device_put(x, repl),
                                 variables)
        img_o = jax.device_put(jnp.asarray(img_o), data)
        img_t = jax.device_put(jnp.asarray(img_t), data)
        keys = jax.device_put(jax.random.split(
            rng if rng is not None else jax.random.PRNGKey(0),
            img_o.shape[0]), data)
        return sharded_program(variables, img_o, img_t, keys)

    # exposed for tests: the shard-mapped program + placements, so the
    # compiled HLO can be audited for accidental cross-chip collectives
    # (tests/test_parallel_inference.py::test_sharded_pipeline_no_collectives)
    run.base = base
    run.sharded_program = sharded_program
    run.data_sharding = data
    run.replicated_sharding = repl
    return run

"""Golden tests for core device ops against numpy/cv2/torch reference
formulas (the same oracles the reference framework uses)."""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from xpoint_tpu.ops import (
    space_to_depth, depth_to_space, warp_image, box_nms,
    prob_from_logits, interpolate_descriptors, mnn_match,
)
from xpoint_tpu.ops.nms import extract_keypoints
from xpoint_tpu.geometry import (
    sample_homography, compute_valid_mask, warp_keypoints, filter_points,
    warp_points,
)


def torch_space_to_depth(x, bs):
    import torch
    x = torch.from_numpy(x)
    N, C, H, W = x.shape
    x = x.view(N, C, H // bs, bs, W // bs, bs)
    x = x.permute(0, 3, 5, 1, 2, 4).contiguous()
    return x.view(N, C * bs * bs, H // bs, W // bs).numpy()


def test_space_to_depth_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 16, 24)).astype(np.float32)
    ref = torch_space_to_depth(x, 8)                  # (2, 64, 2, 3)
    ours = np.asarray(space_to_depth(jnp.asarray(x[:, 0]), 8))  # (2, 2, 3, 64)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_depth_to_space_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 24)).astype(np.float32)
    cells = space_to_depth(jnp.asarray(x), 8)
    back = depth_to_space(cells, 8)[..., 0]
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


def test_prob_from_logits_matches_torch_pixelshuffle():
    import torch
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 4, 5, 65)).astype(np.float32)
    ours = np.asarray(prob_from_logits(jnp.asarray(logits), 8))

    t = torch.from_numpy(logits).permute(0, 3, 1, 2)  # NCHW
    prob = torch.nn.Softmax2d()(t)
    prob = torch.nn.PixelShuffle(8)(prob[:, :-1])
    np.testing.assert_allclose(ours, prob[:, 0].numpy(), atol=1e-5)


def test_warp_image_matches_cv2():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(64, 80)).astype(np.float32)
    H = sample_homography((64, 80), rng=rng)
    ref = cv2.warpPerspective(img, H, (80, 64), flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_CONSTANT)
    ours = np.asarray(warp_image(jnp.asarray(img[..., None]),
                                 jnp.asarray(H), "bilinear", "zeros"))[..., 0]
    # compare away from the border-handling zone (cv2 treats out-of-range
    # source samples as fully-constant; interior must agree)
    valid = cv2.warpPerspective(np.ones((64, 80)), H, (80, 64),
                                flags=cv2.INTER_NEAREST)
    valid = cv2.erode(valid, np.ones((5, 5)), iterations=1).astype(bool)
    diff = np.abs(ref - ours)[valid]
    assert diff.max() < 1e-3, diff.max()


def test_warp_image_reflection_matches_cv2():
    rng = np.random.default_rng(4)
    img = rng.uniform(size=(48, 56)).astype(np.float32)
    H = sample_homography((48, 56), rng=rng)
    ref = cv2.warpPerspective(img, H, (56, 48), flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_REFLECT_101)
    ours = np.asarray(warp_image(jnp.asarray(img[..., None]),
                                 jnp.asarray(H), "bilinear", "reflection"))[..., 0]
    # interior must agree exactly; reflected border regions agree as long as
    # the reflection stays within one period
    center = np.zeros((48, 56), dtype=bool)
    center[8:-8, 8:-8] = True
    assert np.abs(ref - ours)[center].max() < 1e-3


def test_warp_image_horizon_crossing_stays_finite():
    """A homography whose horizon line (projective denom = 0) crosses the
    output canvas must yield finite pixels in every mode. Unsanitized, the
    inf source coords turn into NaN bilinear weights / NaN reflection wrap
    and one such augmentation draw poisons a whole training run (observed:
    cycle-4 device-data run NaN'd at epoch 53)."""
    rng = np.random.default_rng(6)
    img = rng.uniform(size=(64, 64, 1)).astype(np.float32)
    # strong perspective row: denom = 0.03*x - 0.04*y + 1 vanishes along a
    # line through the canvas interior (e.g. x=0, y=25)
    H = np.array([[1.0, 0.1, -3.0],
                  [0.05, 0.9, 2.0],
                  [0.03, -0.04, 1.0]], np.float64)
    Hinv = np.linalg.inv(H)
    ys, xs = np.meshgrid(np.arange(64.0), np.arange(64.0), indexing="ij")
    denom = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    assert (denom > 0).any() and (denom < 0).any()  # horizon in-canvas
    for mode in ("bilinear", "nearest"):
        for pad in ("zeros", "reflection"):
            out = np.asarray(warp_image(jnp.asarray(img), jnp.asarray(H),
                                        mode, pad))
            assert np.isfinite(out).all(), (mode, pad)
    # the batched/multi paths share _source_coords; cover the valid mask too
    from xpoint_tpu.geometry.homography import compute_valid_mask_device
    m = np.asarray(compute_valid_mask_device(jnp.asarray(H[None]), (64, 64)))
    assert np.isfinite(m).all()


def test_warp_points_matches_cv2():
    rng = np.random.default_rng(5)
    kps = rng.uniform(0, 60, size=(30, 2)).astype(np.float64)
    H = sample_homography((64, 64), rng=rng)
    ref64 = warp_keypoints(kps, H, return_type=float)
    ours = np.asarray(warp_points(jnp.asarray(kps[None].astype(np.float32)),
                                  jnp.asarray(H[None].astype(np.float32))))[0]
    # float32 numpy oracle (same arithmetic precision as the device op)
    xy1 = np.concatenate([kps[:, ::-1], np.ones((len(kps), 1))], 1).astype(np.float32)
    w = (H.astype(np.float32) @ xy1.T).T
    ref32 = (w[:, :2] / w[:, 2:])[:, ::-1]
    np.testing.assert_allclose(ours, ref32, atol=1e-3)
    # and fp64 cv2 agrees to sub-pixel
    np.testing.assert_allclose(ours, ref64, atol=0.5)


def test_filter_points():
    pts = np.array([[0, 0], [-1, 3], [5, 5], [9, 9], [10, 5], [5, 10]])
    out = filter_points(pts, (10, 10))
    np.testing.assert_array_equal(out, np.array([[0, 0], [5, 5], [9, 9]]))


def test_box_nms_matches_reference_semantics():
    """Greedy equal-box NMS against a brute-force numpy implementation of the
    reference box_nms (utils.py:148-192)."""
    rng = np.random.default_rng(6)
    prob = rng.uniform(size=(48, 48)).astype(np.float32)
    prob[prob < 0.8] = 0.0
    size, min_prob, iou = 8, 0.015, 0.1

    ours = np.asarray(box_nms(jnp.asarray(prob), size, min_prob, iou))

    # numpy greedy reference
    pts = np.argwhere(prob > min_prob)
    scores = prob[pts[:, 0], pts[:, 1]]
    order = np.argsort(-scores)
    pts, scores = pts[order], scores[order]
    keep = []
    for i in range(len(pts)):
        ok = True
        for j in keep:
            dy = abs(float(pts[i, 0] - pts[j, 0]))
            dx = abs(float(pts[i, 1] - pts[j, 1]))
            inter = max(size - dy, 0) * max(size - dx, 0)
            if inter / (2 * size * size - inter) > iou:
                ok = False
                break
        if ok:
            keep.append(i)
    ref = np.zeros_like(prob)
    for j in keep:
        ref[pts[j, 0], pts[j, 1]] = scores[j]

    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_nms_pallas_matches_xla_path():
    """The VMEM-resident Pallas NMS fixed point (TPU hot path) must equal
    the XLA sweep formulation exactly (interpret mode on CPU), including
    the long-chain ramp and empty heatmaps."""
    from xpoint_tpu.ops.nms import _grid_nms_keep, _grid_nms_keep_pallas
    rng = np.random.default_rng(11)
    prob = rng.uniform(size=(2, 64, 128)).astype(np.float32)
    prob[prob < 0.7] = 0.0
    prob[1, :, :64] = np.linspace(1.0, 0.6, 64)[None, :]   # ramp chains
    prob[0, 40:] = 0.0                                      # sparse region
    for size, thr in [(8, 0.015), (4, 0.5)]:
        valid = jnp.asarray(prob) > thr
        ref = np.asarray(_grid_nms_keep(jnp.asarray(prob), valid, size, 0.1))
        pal = np.asarray(_grid_nms_keep_pallas(jnp.asarray(prob), valid,
                                               size, 0.1))
        np.testing.assert_array_equal(pal, ref)
    # negative min_prob: pixels with score <= 0 are VALID and must be
    # eligible on both paths (the kernel once re-derived validity as p > 0)
    signed = prob - 0.5
    valid = jnp.full(signed.shape, True)
    ref = np.asarray(_grid_nms_keep(jnp.asarray(signed), valid, 8, 0.1))
    pal = np.asarray(_grid_nms_keep_pallas(jnp.asarray(signed), valid,
                                           8, 0.1))
    np.testing.assert_array_equal(pal, ref)


def test_box_nms_long_suppression_chain_converges():
    """A monotone ramp builds a suppression chain needing ~2 sweeps per
    kept point; at 256 columns that's ~128 sweeps — past the old fixed cap
    of 64 (which silently returned a non-greedy keep set). The bound is
    grid-tied now, so the fixed point must be reached: greedy on a strict
    1-px-spaced descending ramp keeps exactly every `size`-th pixel."""
    size, iou = 4, 0.1
    W = 256
    prob = np.zeros((8, W), np.float32)
    prob[4] = np.linspace(1.0, 0.5, W)      # strictly decreasing ramp
    out = np.asarray(box_nms(jnp.asarray(prob), size, 0.015, iou))
    kept_cols = np.flatnonzero(out[4])
    np.testing.assert_array_equal(kept_cols, np.arange(0, W, size))


def test_box_nms_top_k():
    rng = np.random.default_rng(7)
    prob = rng.uniform(size=(64, 64)).astype(np.float32)
    out = np.asarray(box_nms(jnp.asarray(prob), 4, 0.5, keep_top_k=5))
    assert (out > 0).sum() == 5


def test_extract_keypoints_static():
    prob = np.zeros((16, 16), np.float32)
    prob[3, 4] = 0.9
    prob[10, 2] = 0.5
    kps, scores, mask = extract_keypoints(jnp.asarray(prob), k=8, min_prob=0.1)
    kps, scores, mask = map(np.asarray, (kps, scores, mask))
    assert mask.sum() == 2
    assert (kps[0] == [3, 4]).all() and scores[0] == pytest.approx(0.9)
    assert (kps[1] == [10, 2]).all()


def test_interpolate_descriptors_matches_torch():
    import torch
    rng = np.random.default_rng(8)
    desc_map = rng.normal(size=(8, 10, 16)).astype(np.float32)
    kps = rng.uniform(0, 63, size=(20, 2)).astype(np.float32)
    H, W = 64, 80

    ours = np.asarray(interpolate_descriptors(
        jnp.asarray(kps), jnp.asarray(desc_map), (H, W)))

    kp_t = torch.from_numpy(kps.copy())
    kp_t[:, 0] = kp_t[:, 0] / (H * 0.5) - 1.0
    kp_t[:, 1] = kp_t[:, 1] / (W * 0.5) - 1.0
    kp_t = torch.flip(kp_t.view(1, 1, -1, 2), [3])
    dm = torch.from_numpy(desc_map).permute(2, 0, 1)
    ref = torch.nn.functional.grid_sample(dm.unsqueeze(0), kp_t,
                                          align_corners=True)[0, :, 0, :].T
    ref = torch.nn.functional.normalize(ref, p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mnn_match_matches_numpy_reference():
    rng = np.random.default_rng(9)
    d1 = rng.normal(size=(40, 32)).astype(np.float32)
    d2 = rng.normal(size=(50, 32)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    idx2, dist, matched = mnn_match(jnp.asarray(d1), jnp.asarray(d2),
                                    threshold=0.7)
    idx2, dist, matched = map(np.asarray, (idx2, dist, matched))

    # reference NNMatcher (matching.py:44-75)
    dmat = np.sqrt(2 - 2 * np.clip(d1 @ d2.T, -1, 1))
    nn_idx = np.argmin(dmat, axis=1)
    scores = dmat[np.arange(len(d1)), nn_idx]
    keep = scores < 0.7
    idx_rev = np.argmin(dmat, axis=0)
    keep &= np.arange(len(nn_idx)) == idx_rev[nn_idx]

    np.testing.assert_array_equal(matched, keep)
    np.testing.assert_array_equal(idx2[matched], nn_idx[keep])
    np.testing.assert_allclose(dist[matched], scores[keep], atol=1e-5)


def test_compute_valid_mask_erosion():
    H = sample_homography((32, 32), rng=np.random.default_rng(10))
    m0 = compute_valid_mask((32, 32), H, erosion_radius=0)
    m1 = compute_valid_mask((32, 32), H, erosion_radius=3, mask_border=True)
    assert m1.sum() < m0.sum()
    assert set(np.unique(m0)) <= {0.0, 1.0}


def test_compute_valid_mask_device_matches_cv2():
    """Device mask path (erosion = min-pool reduce_window) must reproduce
    the cv2 host mask exactly for every erosion/border combination."""
    from xpoint_tpu.geometry import compute_valid_mask_device
    rng = np.random.default_rng(7)
    shape = (96, 80)
    Hs = np.stack([sample_homography(np.array(shape), rng=rng)
                   .astype(np.float32) for _ in range(8)])
    for er, mb in [(0, False), (5, True), (2, False), (3, True)]:
        host = np.stack([compute_valid_mask(shape, H, er, mb) for H in Hs])
        dev = np.asarray(compute_valid_mask_device(jnp.asarray(Hs), shape,
                                                   er, mb))
        np.testing.assert_array_equal(host, dev)


def test_warp_image_multi_matches_batched_warp():
    """Shared-index multi-warp == per-homography batched warps, all modes."""
    from xpoint_tpu.ops import warp_image_multi
    from xpoint_tpu.ops.warp import warp_image_batch
    rng = np.random.default_rng(1)
    B, n, H, W, C = 2, 5, 48, 40, 3
    img = jnp.asarray(rng.uniform(size=(B, H, W, C)).astype(np.float32))
    Hm = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    Hm[:, 0, 2] = rng.uniform(-9, 9, n)
    Hm[:, 1, 2] = rng.uniform(-9, 9, n)
    Hm[:, 0, 0] = rng.uniform(0.8, 1.2, n)
    Hm[:, 2, 0] = rng.uniform(-2e-4, 2e-4, n)
    Hm = jnp.asarray(Hm)
    for mode in ("bilinear", "nearest"):
        for pad in ("zeros", "reflection"):
            multi = warp_image_multi(img, Hm, mode, pad)
            ref = jnp.stack([
                warp_image_batch(img, jnp.broadcast_to(Hm[i], (B, 3, 3)),
                                 mode, pad) for i in range(n)])
            np.testing.assert_allclose(np.asarray(multi), np.asarray(ref),
                                       atol=1e-5)


def test_knn2_match_lowe_ratio():
    from xpoint_tpu.ops.matching import knn2_match
    rng = np.random.default_rng(20)
    d1 = rng.normal(size=(20, 16)).astype(np.float32)
    d2 = rng.normal(size=(30, 16)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    idx2, dist, matched = map(np.asarray,
                              knn2_match(jnp.asarray(d1), jnp.asarray(d2),
                                         ratio=0.9))
    dmat = np.sqrt(np.maximum(2 - 2 * np.clip(d1 @ d2.T, -1, 1), 0))
    order = np.argsort(dmat, axis=1)
    best, second = order[:, 0], order[:, 1]
    ref_matched = dmat[np.arange(20), best] < 0.9 * dmat[np.arange(20), second]
    np.testing.assert_array_equal(matched, ref_matched)
    np.testing.assert_array_equal(idx2, best)


def test_threshold_match():
    from xpoint_tpu.ops.matching import threshold_match
    rng = np.random.default_rng(21)
    d1 = rng.normal(size=(10, 8)).astype(np.float32)
    d2 = rng.normal(size=(12, 8)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    mat, dmat = map(np.asarray, threshold_match(jnp.asarray(d1),
                                                jnp.asarray(d2),
                                                threshold=1.2))
    ref = np.sqrt(np.maximum(2 - 2 * np.clip(d1 @ d2.T, -1, 1), 0)) < 1.2
    np.testing.assert_array_equal(mat, ref)


def test_box_nms_extract_matches_separate_path():
    from xpoint_tpu.ops.nms import box_nms_extract
    rng = np.random.default_rng(30)
    prob = rng.uniform(size=(64, 64)).astype(np.float32)
    prob[prob < 0.7] = 0.0
    nmsd = box_nms(jnp.asarray(prob), 8, 0.015)
    kps_ref, sc_ref, m_ref = extract_keypoints(nmsd, k=128, min_prob=0.015)
    kps, sc, m = box_nms_extract(jnp.asarray(prob), 8, 0.015, k=128)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
    n = int(np.asarray(m).sum())
    np.testing.assert_array_equal(np.asarray(kps)[:n], np.asarray(kps_ref)[:n])
    np.testing.assert_allclose(np.asarray(sc)[:n], np.asarray(sc_ref)[:n],
                               atol=1e-6)


def test_box_nms_extract_block_topk_parity():
    """The block-max top-k fast path (survivors can't share a b x b block)
    must return the same keypoint set as the flat H*W top-k, both on a
    dense heatmap at the bench operating point and through the fallback
    when k exceeds the block count."""
    from xpoint_tpu.ops.nms import (box_nms_extract, _grid_nms_keep,
                                    _nms_block_edge)
    rng = np.random.default_rng(7)
    H = W = 256
    prob = rng.uniform(size=(H, W)).astype(np.float32)
    prob[prob < 0.3] = 0.0                     # dense survivors
    size, iou, min_prob = 8, 0.1, 0.015
    assert _nms_block_edge(size, iou, H, W) == 4

    kps, sc, m = box_nms_extract(jnp.asarray(prob), size, min_prob,
                                 iou=iou, k=1024)
    # flat reference path computed by hand
    keep = _grid_nms_keep(jnp.asarray(prob)[None],
                          jnp.asarray(prob > min_prob)[None], size, iou)[0]
    import jax.lax
    kept = np.where(np.asarray(keep), prob, 0.0).reshape(-1)
    sc_ref, idx_ref = jax.lax.top_k(jnp.asarray(kept), 1024)
    m_ref = np.asarray(sc_ref) > min_prob
    n = int(m_ref.sum())
    assert n > 100                              # the case has real density
    np.testing.assert_array_equal(np.asarray(m), m_ref)
    # same keypoint SET with same scores (tie order between equal scores
    # in different blocks may differ; scores here are continuous)
    got = {tuple(map(int, kp)) for kp in np.asarray(kps)[:n]}
    want = {(int(i) // W, int(i) % W) for i in np.asarray(idx_ref)[:n]}
    assert got == want
    np.testing.assert_allclose(np.sort(np.asarray(sc)[:n]),
                               np.sort(np.asarray(sc_ref)[:n]), atol=1e-6)

    # k larger than the block count -> flat fallback still correct
    kps2, sc2, m2 = box_nms_extract(jnp.asarray(prob), size, min_prob,
                                    iou=iou, k=8192)
    n2 = int(np.asarray(m2).sum())
    assert n2 == n
    got2 = {tuple(map(int, kp)) for kp in np.asarray(kps2)[:n2]}
    assert got2 == want

def test_sample_homography_follows_global_seed():
    """With no explicit rng, sample_homography must draw from the GLOBAL
    np.random stream (reference homographies.py samples via legacy
    np.random, so a CLI-level np.random.seed() makes every eval's warp set
    reproducible). An unseeded default_rng() made benchmark runs
    non-comparable across invocations."""
    np.random.seed(123)
    H1 = sample_homography((64, 64))
    np.random.seed(123)
    H2 = sample_homography((64, 64))
    np.testing.assert_array_equal(H1, H2)
    H3 = sample_homography((64, 64))     # stream advances
    assert not np.allclose(H1, H3)

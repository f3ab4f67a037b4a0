"""Box non-maximum suppression on the probability heatmap, fully on device.

TPU-native replacement for the torchvision-NMS-based reference box_nms
(utils/utils.py:148-192): hypothetical ``size x size`` boxes centered at every
pixel above ``min_prob``, greedy suppression at IoU ``iou``, optional top-k.

Dynamic candidate sets don't jit, so candidates are the top
``max_candidates`` scores (pad + mask) — exact as long as ``max_candidates``
exceeds the number of above-threshold pixels (4096 default vs ~1-3k typical
at the 0.015 operating threshold).

Greedy suppression runs as a lax.fori_loop over candidates in score order
with an O(K) vector update per step; equal-sized boxes make the pairwise
IoU a simple separable overlap product.
"""
from functools import partial

import jax
import jax.numpy as jnp


def _greedy_nms_indices(ys, xs, scores, valid, size, iou):
    """Greedy NMS over candidates sorted by descending score.

    Exact greedy semantics via fixed-point iteration instead of a K-step
    sequential loop: with the suppression DAG restricted to higher-scoring
    boxes (strict lower-triangular overlap matrix M), iterate
        keep <- valid & ~(keep @ M)
    from keep = valid. The fixed point is unique and equals the greedy
    result (induction over score rank); convergence takes as many sweeps as
    the longest suppression chain (typically < 10), each sweep one K x K
    matvec on the MXU — thousands of times fewer sequential steps than the
    torchvision-style loop the reference uses (utils.py:148-192).

    Args: all (K,) arrays, already sorted by descending score.
    Returns keep mask (K,) bool.
    """
    K = scores.shape[0]
    s = jnp.float32(size)
    # pairwise intersection of size-s axis-aligned boxes centered at points
    dy = jnp.abs(ys[:, None] - ys[None, :])
    dx = jnp.abs(xs[:, None] - xs[None, :])
    inter = jnp.maximum(s - dy, 0.0) * jnp.maximum(s - dx, 0.0)
    iou_mat = inter / (2.0 * s * s - inter)
    # M[j, i] = True where j (higher score) suppresses i. bf16 is exact for
    # a 0/1 matrix and the matvec result is only tested against zero, so the
    # sweep runs at full MXU bf16 speed with no semantic change.
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    M = ((iou_mat > iou) & (rows < cols)).astype(jnp.bfloat16)
    valid_f = valid.astype(jnp.bfloat16)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < K)

    def body(state):
        keep, _, it = state
        suppressed = jnp.dot(keep, M,
                             preferred_element_type=jnp.float32) > 0.0
        new = valid_f * (1.0 - suppressed.astype(jnp.bfloat16))
        return new, keep, it + 1

    keep0 = valid_f
    keep, _, _ = jax.lax.while_loop(cond, body,
                                    (keep0, jnp.zeros_like(keep0) - 1.0,
                                     jnp.int32(0)))
    return keep > 0.5


@partial(jax.jit, static_argnames=("size", "iou", "keep_top_k", "max_candidates"))
def box_nms(prob, size, min_prob, iou=0.1, keep_top_k=0, max_candidates=4096):
    """NMS a heatmap; returns the heatmap with suppressed scores zeroed.

    Args:
        prob: (H, W) or (B, H, W) probability heatmap.
        size: box side length (reference 'nms' config, typically 8).
        min_prob: detection threshold applied before NMS.
        iou: IoU threshold (reference default 0.1).
        keep_top_k: if > 0, keep only the k highest surviving scores.
        max_candidates: static cap on candidates entering NMS.

    Returns:
        Heatmap of the same shape with only kept detections non-zero.
    """
    if prob.ndim == 2:
        return _box_nms_single(prob, size, min_prob, iou, keep_top_k, max_candidates)
    fn = partial(_box_nms_single, size=size, iou=iou, keep_top_k=keep_top_k,
                 max_candidates=max_candidates)
    return jax.vmap(lambda p: fn(p, min_prob=min_prob))(prob)


def _box_nms_single(prob, size, min_prob, iou, keep_top_k, max_candidates):
    H, W = prob.shape
    flat = prob.reshape(-1)
    K = min(max_candidates, H * W)
    scores, idx = jax.lax.top_k(flat, K)
    valid = scores > min_prob
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    keep = _greedy_nms_indices(ys, xs, scores.astype(jnp.float32), valid, size, iou)

    if keep_top_k and keep_top_k > 0:
        kept_rank = jnp.cumsum(keep.astype(jnp.int32))  # rank among kept (1-based)
        keep = keep & (kept_rank <= keep_top_k)

    out = jnp.zeros_like(flat)
    out = out.at[idx].set(jnp.where(keep, scores, 0.0).astype(prob.dtype))
    return out.reshape(H, W)


@partial(jax.jit, static_argnames=("size", "iou", "k", "max_candidates"))
def box_nms_extract(prob, size, min_prob, iou=0.1, k=1024,
                    max_candidates=4096):
    """Fused NMS + keypoint extraction: identical results to
    box_nms -> extract_keypoints but without scattering back to the
    full-resolution heatmap and re-running top-k over H*W — the kept
    candidates are already known inside the NMS.

    Returns (keypoints (k, 2) int32, scores (k,), mask (k,)).
    """
    H, W = prob.shape
    flat = prob.reshape(-1)
    K = min(max_candidates, H * W)
    scores, idx = jax.lax.top_k(flat, K)
    valid = scores > min_prob
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    keep = _greedy_nms_indices(ys, xs, scores.astype(jnp.float32), valid,
                               size, iou)
    kept_scores = jnp.where(keep, scores, 0.0)
    top_scores, top_i = jax.lax.top_k(kept_scores, min(k, K))
    mask = top_scores > min_prob
    kps = jnp.stack([(idx[top_i] // W).astype(jnp.int32),
                     (idx[top_i] % W).astype(jnp.int32)], axis=-1)
    kps = jnp.where(mask[:, None], kps, 0)
    scores_out = jnp.where(mask, top_scores, 0.0)
    if k > K:
        pad = k - K
        kps = jnp.pad(kps, ((0, pad), (0, 0)))
        scores_out = jnp.pad(scores_out, (0, pad))
        mask = jnp.pad(mask, (0, pad))
    return kps, scores_out, mask


@partial(jax.jit, static_argnames=("k", "min_prob"))
def extract_keypoints(prob_nms, k, min_prob=0.0):
    """Fixed-size keypoint extraction from an NMS'd heatmap.

    Replaces the reference's dynamic ``torch.nonzero`` keypoint extraction
    (predict_align_image_pair.py:242-243) with static-shape top-k + validity
    mask, as required for jit.

    Returns:
        keypoints: (k, 2) int32 (row, col), padded with 0.
        scores:    (k,) float scores, 0 for padding.
        mask:      (k,) bool validity.
    """
    H, W = prob_nms.shape
    flat = prob_nms.reshape(-1)
    scores, idx = jax.lax.top_k(flat, k)
    mask = scores > min_prob
    ys = (idx // W).astype(jnp.int32)
    xs = (idx % W).astype(jnp.int32)
    kps = jnp.stack([ys, xs], axis=-1)
    kps = jnp.where(mask[:, None], kps, 0)
    scores = jnp.where(mask, scores, 0.0)
    return kps, scores, mask

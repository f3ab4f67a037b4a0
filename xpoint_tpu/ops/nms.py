"""Box non-maximum suppression on the probability heatmap, fully on device.

TPU-native replacement for the torchvision-NMS-based reference box_nms
(utils/utils.py:148-192): hypothetical ``size x size`` boxes centered at every
pixel above ``min_prob``, greedy suppression at IoU ``iou``, optional top-k.

Greedy suppression runs as a fixed-point iteration directly on the heatmap
grid (no candidate extraction, no K x K matrix): each sweep asks every
above-threshold pixel "does a strictly-higher-scoring kept pixel overlap
me?", answered by a few reduce_window running maxes — see _grid_nms_keep.
All above-threshold pixels participate (the reference caps nothing either).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _overlap_widths(size, iou):
    """allowed |dx| per |dy| for the equal-box IoU criterion: boxes at
    offset (dy, dx) suppress iff (s-|dy|)(s-|dx|) / (2s^2 - inter) > iou."""
    s = float(size)
    thr = 2.0 * iou * s * s / (1.0 + iou)
    widths = []
    for dy in range(size):
        w = -1
        for dx in range(size):
            if (s - dy) * (s - dx) > thr:
                w = dx
        widths.append(w)
    return widths


def _nms_sweep_kernel(p_ref, keep_ref, keep_scr, *, size, iou, widths):
    """Whole-heatmap NMS fixed point in VMEM (one grid step per sample).

    The XLA formulation of the same sweep round-trips several (B, H, W)
    planes through HBM per sweep (profiled 8.4 ms/batch at 512^2 B=8, the
    reduce_window stages don't fuse); here the heatmap is read ONCE, all
    sweeps run on VMEM-resident data, and only the kept mask is written
    back. Shifts are static pad/slice (concatenate with -inf borders), so
    out-of-image neighborhoods are exactly -inf like the XLA path.

    The evolving keep mask lives in a VMEM SCRATCH ref and the while loop
    carries only two scalars — Mosaic mis-lowers big (or boolean) vector
    loop carries, and a (512, 512) plane is 256 vregs of carry otherwise.
    """
    neg = jnp.float32(-jnp.inf)
    p = p_ref[0].astype(jnp.float32)              # (H, W), invalid == -inf
    H, W = p.shape
    # all-negative widths (iou >= 1) means no pair ever suppresses — the
    # XLA path degrades to keep-everything-valid; mirror that here
    max_w = max((w for w in widths if w >= 0), default=0)
    keep_scr[...] = jnp.where(p != neg, 1.0, 0.0)

    def shift_x(a, d):
        fill = jnp.full((H, abs(d)), neg, jnp.float32)
        if d > 0:
            return jnp.concatenate([a[:, d:], fill], axis=1)
        return jnp.concatenate([fill, a[:, :d]], axis=1)

    def shift_y(a, d):
        fill = jnp.full((abs(d), W), neg, jnp.float32)
        if d > 0:
            return jnp.concatenate([a[d:, :], fill], axis=0)
        return jnp.concatenate([fill, a[:d, :]], axis=0)

    def neighbor_max(S):
        # incremental horizontal running maxes: row_max[w] = max |dx|<=w
        row_max = {0: S}
        for w in range(1, max_w + 1):
            row_max[w] = jnp.maximum(row_max[w - 1],
                                     jnp.maximum(shift_x(S, w),
                                                 shift_x(S, -w)))
        out = jnp.full_like(S, neg)
        for dy in range(-(size - 1), size):
            w = widths[abs(dy)]
            if w < 0:
                continue
            r = row_max[w]
            out = jnp.maximum(out, r if dy == 0 else shift_y(r, dy))
        return out

    def cond(state):
        changed, it = state
        return jnp.logical_and(changed > 0, it < H * W)

    def body(state):
        _, it = state
        keep = keep_scr[...]
        S = jnp.where(keep > 0.5, p, neg)
        new = jnp.where((p != neg) & ~(neighbor_max(S) > p), 1.0, 0.0)
        keep_scr[...] = new
        changed = jnp.sum((new != keep).astype(jnp.int32))
        return changed, it + 1

    jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
    keep_ref[0] = keep_scr[...]


@partial(jax.jit, static_argnames=("size", "iou"))
def _grid_nms_keep_pallas(prob, valid, size, iou):
    """VMEM-resident NMS fixed point; same contract as _grid_nms_keep."""
    B, H, W = prob.shape
    # invalid pixels carry -inf (NOT 0) so the kernel's keep set is exactly
    # the caller's valid mask — scores <= 0 on valid pixels stay eligible,
    # matching the XLA path's semantics for negative min_prob
    p = jnp.where(valid, prob.astype(jnp.float32), -jnp.inf)
    widths = tuple(_overlap_widths(size, iou))
    keep = pl.pallas_call(
        partial(_nms_sweep_kernel, size=size, iou=iou, widths=widths),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=(jax.default_backend() == "cpu"),
    )(p)
    return (keep > 0.5) & valid


def _nms_vmem_ok(H, W):
    # whole-heatmap VMEM residency: p + ~6 live sweep planes, fp32
    return H * W * 4 * 8 <= 12 * 1024 * 1024 and W % 128 == 0 and H % 8 == 0


@partial(jax.jit, static_argnames=("size", "iou"))
def _grid_nms_keep(prob, valid, size, iou):
    """Greedy box-NMS as a fixed point ON THE HEATMAP GRID.

    The candidate-matrix formulation materializes a K x K suppression
    matrix (34 MB bf16 at K=4096) and re-reads it every sweep — profiled
    at ~15 ms/batch, the single largest cost in the detect pipeline. But
    equal-size boxes only interact within a (2s-1)^2 neighborhood, so the
    sweep
        keep <- valid & ~(exists kept neighbor with strictly higher score)
    is a handful of reduce_window running maxes over the heatmap: the
    overlap region {(dy,dx): iou(dy,dx) > thr} decomposes into horizontal
    strips of per-|dy| width, giving (#distinct widths) horizontal max
    passes + (2s-1) shifted vertical max combines per sweep. The fixed
    point equals greedy NMS by the same rank-induction as the matrix
    version under strict score order; EXACT score ties between overlapping
    candidates keep both here, where the reference's index-order greedy
    keeps one (float-exact ties in softmaxed heatmaps are measure-zero).

    prob: (B, H, W); valid: (B, H, W) bool (above-threshold).
    Returns keep: (B, H, W) bool.
    """
    if (jax.default_backend() == "tpu"
            and _nms_vmem_ok(prob.shape[1], prob.shape[2])):
        # whole-heatmap-in-VMEM Pallas fixed point (identical sweeps, no
        # per-sweep HBM round trips); XLA fallback below for CPU and
        # shapes that exceed VMEM
        return _grid_nms_keep_pallas(prob, valid, size, iou)
    widths = _overlap_widths(size, iou)
    neg = jnp.float32(-jnp.inf)   # below any real score

    def neighbor_max(S):
        # horizontal running max per distinct width (reduce_window), then a
        # vertical combine of shifted row maxes — the shifts are pad+slice
        # ops XLA fuses into one loop fusion, measurably faster than
        # stacking vertical reduce_windows (which do not fuse)
        row_max = {}
        for w in sorted({w for w in widths if w >= 0}):
            row_max[w] = jax.lax.reduce_window(
                S, neg, jax.lax.max, (1, 1, 2 * w + 1), (1, 1, 1), "SAME")
        out = jnp.full_like(S, neg)
        for dy in range(-(size - 1), size):
            w = widths[abs(dy)]
            if w < 0:
                continue
            r = row_max[w]
            if dy > 0:
                shifted = jnp.pad(r[:, dy:], ((0, 0), (0, dy), (0, 0)),
                                  constant_values=neg)
            elif dy < 0:
                shifted = jnp.pad(r[:, :dy], ((0, 0), (-dy, 0), (0, 0)),
                                  constant_values=neg)
            else:
                shifted = r
            out = jnp.maximum(out, shifted)
        return out

    p = prob.astype(jnp.float32)

    # Sweep bound: each sweep finalizes at least the highest-scoring
    # still-undecided candidate of every suppression chain, so H*W sweeps
    # always converge; realistic heatmaps converge in < 10 and the loop
    # exits on the keep == prev fixed-point test long before the bound.
    # A fixed cap of 64 (previous version) could silently return a
    # non-greedy keep set on adversarial ramp heatmaps whose chains exceed
    # it — the bound is grid-tied instead so the fixed point is always
    # reached (see tests/test_ops_core.py ramp-chain case).
    H, W = prob.shape[1], prob.shape[2]
    max_sweeps = H * W

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < max_sweeps)

    def body(state):
        keep, _, it = state
        S = jnp.where(keep, p, neg)
        suppressed = neighbor_max(S) > p
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body,
                                    (valid, ~valid, jnp.int32(0)))
    return keep


@partial(jax.jit, static_argnames=("size", "iou", "keep_top_k", "max_candidates"))
def box_nms(prob, size, min_prob, iou=0.1, keep_top_k=0, max_candidates=4096):
    """NMS a heatmap; returns the heatmap with suppressed scores zeroed.

    Args:
        prob: (H, W) or (B, H, W) probability heatmap.
        size: box side length (reference 'nms' config, typically 8).
        min_prob: detection threshold applied before NMS. Must be >= 0:
            suppressed scores are encoded as 0 in the output heatmap (the
            reference's contract for softmax probabilities), so a negative
            threshold would re-admit suppressed pixels downstream (the
            keep-mask layer itself, _grid_nms_keep, is sign-agnostic).
        iou: IoU threshold (reference default 0.1).
        keep_top_k: if > 0, keep only the k highest surviving scores.
        max_candidates: static cap on candidates entering NMS.

    Returns:
        Heatmap of the same shape with only kept detections non-zero.
    """
    squeeze = prob.ndim == 2
    p = prob[None] if squeeze else prob
    valid = p > min_prob
    keep = _grid_nms_keep(p, valid, size, iou)
    out = jnp.where(keep, p, 0.0).astype(prob.dtype)
    if keep_top_k and keep_top_k > 0:
        B, H, W = out.shape
        flat = out.reshape(B, H * W)
        scores, idx = jax.lax.top_k(flat, min(keep_top_k, H * W))
        flat = jnp.zeros_like(flat)
        flat = jax.vmap(lambda f, i, s: f.at[i].set(s))(flat, idx, scores)
        out = flat.reshape(B, H, W)
    return out[0] if squeeze else out


def _nms_block_edge(size, iou, H, W):
    """Largest power-of-2 block edge b such that two NMS survivors can
    never share a b x b block: same-block pixels sit at offsets
    |dy|, |dx| <= b-1, whose box overlap (s-|dy|)(s-|dx|) >= (s-(b-1))^2
    exceeds the suppression threshold, so one of any same-block pair is
    always suppressed (exact score ties excepted — measure-zero, see
    _grid_nms_keep). 0 if no admissible b >= 2 divides the grid."""
    thr = 2.0 * iou * size * size / (1.0 + iou)
    b = 0
    for cand in (2, 4, 8):
        if (H % cand or W % cand
                or (size - (cand - 1)) ** 2 <= thr or cand > size):
            break
        b = cand
    return b


@partial(jax.jit, static_argnames=("size", "iou", "k", "max_candidates"))
def box_nms_extract(prob, size, min_prob, iou=0.1, k=1024,
                    max_candidates=4096):
    """Fused NMS + keypoint extraction: identical results to
    box_nms -> extract_keypoints but without scattering back to the
    full-resolution heatmap and re-running top-k over H*W — the kept
    candidates are already known inside the NMS.

    min_prob must be >= 0 (see box_nms — 0 is the suppressed sentinel).

    Returns (keypoints (k, 2) int32, scores (k,), mask (k,)).
    """
    del max_candidates  # grid NMS considers every above-threshold pixel
    H, W = prob.shape
    keep = _grid_nms_keep(prob[None], (prob > min_prob)[None], size, iou)[0]
    kept = jnp.where(keep, prob, 0.0).reshape(-1)
    kk = min(k, H * W)
    b = _nms_block_edge(size, iou, H, W)
    if b and (H // b) * (W // b) >= kk:
        # survivors are <= 1 per b x b block, so an exact top-k over the
        # block maxes (16x fewer elements at b=4) recovers the same
        # keypoint set — top_k sort was ~2 ms/batch on the full 512^2
        # grid, the dominant post-NMS cost. Positions come from a
        # vectorized per-block argmax (block-min over an index map masked
        # to the block max); a (kk, b*b) gather formulation measured
        # ~1 ms/batch per spectrum — TPU gathers are scalar-bound.
        km = kept.reshape(H, W)
        red = lambda a, init, op, win: jax.lax.reduce_window(
            a, init, op, win, win, "VALID")
        bmax1 = red(km, jnp.float32(-jnp.inf), jax.lax.max, (1, b))
        bmax = red(bmax1, jnp.float32(-jnp.inf), jax.lax.max, (b, 1))
        top_scores, bidx = jax.lax.top_k(bmax.reshape(-1), kk)
        up = jnp.repeat(jnp.repeat(bmax, b, axis=0), b, axis=1)
        flat_iota = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
        cand = jnp.where((km == up) & (km > 0.0), flat_iota,
                         jnp.int32(H * W))
        c1 = red(cand, jnp.int32(H * W), jax.lax.min, (1, b))
        cidx = red(c1, jnp.int32(H * W), jax.lax.min, (b, 1))
        idx = jnp.take(cidx.reshape(-1), bidx, axis=0)
        idx = jnp.where(idx == H * W, 0, idx)      # empty block (masked)
    else:
        top_scores, idx = jax.lax.top_k(kept, kk)
    mask = top_scores > min_prob
    kps = jnp.stack([(idx // W).astype(jnp.int32),
                     (idx % W).astype(jnp.int32)], axis=-1)
    kps = jnp.where(mask[:, None], kps, 0)
    scores_out = jnp.where(mask, top_scores, 0.0)
    if k > kk:
        pad = k - kk
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

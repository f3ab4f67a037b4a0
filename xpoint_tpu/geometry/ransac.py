"""On-device homography estimation: batched normalized DLT + RANSAC with
MAGSAC-style truncated scoring.

The reference estimates homographies host-side with cv2 USAC_MAGSAC
(evaluation.py:371-380), forcing a device->host round trip per pair. This
module keeps the whole registration chain on the TPU: all RANSAC hypotheses
are fitted in one batched SVD (vmapped 8x9 DLT systems) and scored against
all matches with one matrix op. cv2 remains the parity path for metrics
(eval/metrics.estimate_homography); this is the production/perf path,
exposed through make_pair_pipeline(estimate_homography=True).
"""
from functools import partial

import jax
import jax.numpy as jnp


def _normalization(pts, mask):
    """Hartley normalization: similarity transform -> centroid 0, mean
    distance sqrt(2). pts (N, 2) xy, mask (N,). Returns (T (3,3), pts_n)."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(0) / n
    d = jnp.sqrt(((pts - mean) ** 2).sum(-1)) * w
    scale = jnp.sqrt(2.0) / jnp.maximum(d.sum() / n, 1e-8)
    T = jnp.array([[1.0, 0.0, -mean[0]],
                   [0.0, 1.0, -mean[1]],
                   [0.0, 0.0, 1.0 / scale]]) * scale
    pts_n = (pts - mean) * scale
    return T, pts_n


def fit_homography_dlt(pts1, pts2, weights=None):
    """Weighted DLT from (N, 2) xy correspondences. Returns (3, 3) H with
    H @ [x1, y1, 1]^T ~ [x2, y2, 1]^T. Degenerate sets give garbage H that
    simply scores zero inliers downstream."""
    N = pts1.shape[0]
    if weights is None:
        weights = jnp.ones((N,), jnp.float32)
    x1, y1 = pts1[:, 0], pts1[:, 1]
    x2, y2 = pts2[:, 0], pts2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], -1)
    A = jnp.concatenate([r1, r2], 0) * jnp.concatenate(
        [weights, weights], 0)[:, None]
    # h = right singular vector of the smallest singular value
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    h = vt[-1]
    return h.reshape(3, 3)


def _reproj_error(H, pts1, pts2):
    """Symmetric-free forward transfer error |H p1 - p2| (cv2 semantics)."""
    ones = jnp.ones((pts1.shape[0], 1), pts1.dtype)
    p = jnp.concatenate([pts1, ones], -1) @ H.T
    proj = p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) < 1e-12, 1e-12, p[:, 2:])
    return jnp.sqrt(((proj - pts2) ** 2).sum(-1))


@partial(jax.jit, static_argnames=("n_iters", "refine", "n_refine"))
def ransac_homography(pts1, pts2, mask, rng, threshold=3.0, n_iters=512,
                      refine=True, quality=None, n_refine=16):
    """Batched RANSAC homography.

    Args:
        pts1/pts2: (N, 2) xy matched points (padded).
        mask: (N,) validity of each match.
        rng: jax PRNG key.
        threshold: inlier reprojection threshold (px).
        n_iters: hypotheses, all fitted/scored in parallel.
        refine: anneal-refine the top hypotheses (LO-RANSAC flavor).
        quality: optional (N,) match quality, LOWER is better (descriptor
            distance). Enables PROSAC-style progressive sampling: early
            hypotheses draw from the best few matches, later ones from
            the whole set — inliers concentrate among the best matches,
            so this raises the all-inlier sample rate by orders of
            magnitude on low-inlier-ratio data (cv2 USAC's sampler).
        n_refine: how many top-scored hypotheses get the full annealed
            refinement (best final score wins).

    Returns dict(H (3,3), inliers (N,) bool, score (), n_inliers ()).
    """
    N = pts1.shape[0]
    pts1 = pts1.astype(jnp.float32)
    pts2 = pts2.astype(jnp.float32)
    logits = jnp.where(mask, 0.0, -jnp.inf)

    # sample 4 distinct indices per hypothesis via Gumbel top-k
    g = jax.random.gumbel(rng, (n_iters, N)) + logits[None]
    if quality is not None:
        # PROSAC-style schedule: hypothesis j draws its 4-sample from the
        # top n_j quality-ranked matches, n_j growing geometrically from
        # 8 to N across the batch of hypotheses
        order = jnp.argsort(jnp.where(mask, quality, jnp.inf))
        rank = jnp.argsort(order)                        # (N,) 0 = best
        jfrac = jnp.arange(n_iters, dtype=jnp.float32) / max(n_iters - 1, 1)
        n_j = 8.0 * (N / 8.0) ** jfrac                   # (n_iters,)
        g = g + jnp.where(rank[None, :] < n_j[:, None], 0.0, -jnp.inf)
    _, sel = jax.lax.top_k(g, 4)                        # (n_iters, 4)

    def fit_one(idx):
        # NOTE: minimal 4-point fits stay UNnormalized on purpose —
        # Hartley-normalizing them was measured WORSE on the seeded
        # 64-pair benchmark (h@4 0.031 -> 0.0); the refinement stage
        # normalizes its (weighted, non-minimal) refits where
        # conditioning actually pays
        return fit_homography_dlt(pts1[idx], pts2[idx])

    Hs = jax.vmap(fit_one)(sel)                         # (n_iters, 3, 3)
    errs = jax.vmap(lambda H: _reproj_error(H, pts1, pts2))(Hs)
    valid = mask[None, :]

    def trunc_score(e, v, th):
        return jnp.where(v & (e < th), 1.0 - (e / th) ** 2, 0.0).sum(-1)

    # MAGSAC-flavored scoring: marginalize the truncated-quadratic score
    # over a noise-scale ladder up to 8x the threshold instead of
    # committing to one sigma — on low-inlier/noisy matches the right
    # registration often has only 1-5 strict inliers but 10-20 loose
    # (2-8x) ones, and a strict-only score cannot see them (this is what
    # cv2 USAC_MAGSAC's sigma marginalization buys)
    def marg_score_from_errs(e, v):
        return (trunc_score(e, v, threshold)
                + 0.5 * trunc_score(e, v, 2.0 * threshold)
                + 0.25 * trunc_score(e, v, 4.0 * threshold)
                + 0.125 * trunc_score(e, v, 8.0 * threshold))

    scores = marg_score_from_errs(errs, valid)

    def marg_score(H):
        return marg_score_from_errs(_reproj_error(H, pts1, pts2), mask)

    if refine:
        # LO-RANSAC-style local optimization on the TOP n_refine
        # hypotheses (not just the single best — the sampling score's
        # argmax is often not the hypothesis that refines best):
        # annealed iteratively-reweighted refits on truncated-quadratic
        # weights down a shrinking sigma ladder; the best iterate and
        # the final winner are judged by the SAME marginalized score the
        # hypotheses were ranked with (a strict-threshold criterion
        # collapses on pairs whose consensus only exists at 2-4x sigma).
        def refine_once(H_cur, th):
            err = _reproj_error(H_cur, pts1, pts2)
            w = jnp.where(mask & (err < th), 1.0 - (err / th) ** 2, 0.0)
            T1, p1n = _normalization(pts1, w > 0)
            T2, p2n = _normalization(pts2, w > 0)
            Hn = fit_homography_dlt(p1n, p2n, w)
            return jnp.linalg.inv(T2) @ Hn @ T1

        def refine_full(H0):
            H_best_i, s_best_i = H0, marg_score(H0)
            H_cur = H0
            for th in (8.0 * threshold, 4.0 * threshold, 2.0 * threshold,
                       threshold, threshold):
                H_cur = refine_once(H_cur, th)
                s_cur = marg_score(H_cur)
                better = s_cur >= s_best_i
                H_best_i = jnp.where(better, H_cur, H_best_i)
                s_best_i = jnp.maximum(s_cur, s_best_i)
            return H_best_i, s_best_i

        k_ref = min(n_refine, n_iters)
        _, top_idx = jax.lax.top_k(scores, k_ref)
        H_cands, s_cands = jax.vmap(refine_full)(Hs[top_idx])
        best = jnp.argmax(s_cands)
        H_best = H_cands[best]
        # final strict-sigma polish: two IRLS rounds at the caller's
        # threshold, accepted only if the STRICT score improves — tightens
        # the winner onto its exact consensus without risking the
        # marginalized selection above
        def strict_score(H):
            return trunc_score(_reproj_error(H, pts1, pts2), mask, threshold)

        for _ in range(2):
            H_pol = refine_once(H_best, threshold)
            use = strict_score(H_pol) > strict_score(H_best)
            H_best = jnp.where(use, H_pol, H_best)
    else:
        H_best = Hs[jnp.argmax(scores)]

    err = _reproj_error(H_best, pts1, pts2)
    inliers = mask & (err < threshold)
    H_best = H_best / jnp.where(jnp.abs(H_best[2, 2]) < 1e-12, 1e-12,
                                H_best[2, 2])
    return {"H": H_best, "inliers": inliers,
            "score": jnp.where(mask & (err < threshold),
                               1.0 - (err / threshold) ** 2, 0.0).sum(),
            "n_inliers": inliers.sum()}


def estimate_homography_device(pts1, pts2, reprojection_threshold=3.0,
                               n_iters=8192, seed=0, max_points=8192,
                               quality=None):
    """Host-facing drop-in for eval/metrics.estimate_homography running the
    batched DLT+RANSAC on device (the production path; cv2 USAC_MAGSAC
    stays the parity default — reference evaluation.py:371-380).

    pts1/pts2: (N, 2) float (x, y) matched points. Returns (H (3, 3)
    float64 numpy or None, inlier mask (N, 1) uint8 — cv2.findHomography's
    shape, always the full input length N). Points are padded to the next
    power of two so the jitted program compiles once per size bucket, not
    per N. Above ``max_points`` only the first ``max_points`` matches are
    fitted/scored (deterministic head truncation; the cv2 path uses all) —
    the excess rows come back as outliers (0) in the mask.

    quality: optional (N,) per-match quality, lower is better (descriptor
    match distance) — enables PROSAC-style progressive sampling.
    """
    import numpy as np

    pts1 = np.asarray(pts1, np.float32).reshape(-1, 2)
    pts2 = np.asarray(pts2, np.float32).reshape(-1, 2)
    n_in = pts1.shape[0]
    n = n_in
    if n < 4 or pts2.shape[0] != n:
        return None, None
    cap = min(max(16, 1 << (n - 1).bit_length()), max_points)
    if n > cap:
        pts1, pts2, n = pts1[:cap], pts2[:cap], cap
    pad = cap - n
    p1 = np.pad(pts1, ((0, pad), (0, 0)))
    p2 = np.pad(pts2, ((0, pad), (0, 0)))
    mask = np.arange(cap) < n
    q = None
    if quality is not None:
        q = np.full((cap,), np.inf, np.float32)
        q[:n] = np.asarray(quality, np.float32).reshape(-1)[:n]
        q = jnp.asarray(q)
    # cap hypothesis count so the (n_iters, cap) score/gumbel intermediates
    # stay bounded (~64 MB fp32): big caps get fewer but PROSAC-guided
    # draws, small caps (the common eval regime, cap <= 512) keep them all
    n_iters = min(n_iters, max(1024, (1 << 24) // cap))
    # one host fetch for the whole output dict — each extra device->host
    # read costs a tunnel round trip (~25 ms, .claude/skills/verify)
    out = jax.device_get(
        ransac_homography(jnp.asarray(p1), jnp.asarray(p2),
                          jnp.asarray(mask), jax.random.PRNGKey(seed),
                          threshold=reprojection_threshold,
                          n_iters=n_iters, quality=q))
    if int(out["n_inliers"]) < 4:
        return None, None
    H = np.asarray(out["H"], np.float64)
    if not np.all(np.isfinite(H)):
        return None, None
    inl = np.zeros((n_in, 1), np.uint8)
    inl[:n, 0] = out["inliers"][:n]
    return H, inl

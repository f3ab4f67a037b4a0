"""On-device descriptor matching (MXU distance matrix + mutual-NN).

TPU-native replacement for cv2.BFMatcher(NORM_L2, crossCheck=True) and the
reference NNMatcher (matching.py:38-75): L2 distance on unit descriptors is
sqrt(2 - 2 * <d1, d2>); mutual nearest neighbors with optional threshold.
"""
from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def descriptor_distance_matrix(desc1, desc2):
    """(N1, D), (N2, D) unit descriptors -> (N1, N2) L2 distances."""
    # HIGH = bf16x3 on TPU: fp32-grade accuracy at 3 bf16 passes instead of
    # the 6-pass fp32 emulation of HIGHEST; match decisions are unchanged
    dots = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32,
                   precision="high")
    return jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.clip(dots, -1.0, 1.0), 0.0))


@partial(jax.jit, static_argnames=("cross_check",))
def mnn_match(desc1, desc2, mask1=None, mask2=None, threshold=None,
              cross_check=True):
    """Mutual-nearest-neighbor matching with padding masks.

    Args:
        desc1: (N1, D) unit descriptors (query side).
        desc2: (N2, D) unit descriptors (train side).
        mask1/mask2: optional validity masks for padded keypoints.
        threshold: optional max L2 distance (reference NNMatcher nn_thresh).
        cross_check: require the match to be mutual (BFMatcher crossCheck).

    Returns:
        idx2: (N1,) int32 index into desc2 of each query's NN.
        dist: (N1,) float32 NN distance.
        matched: (N1,) bool — True where a (mutual) match survived.
    """
    BIG = jnp.float32(1e9)
    dmat = descriptor_distance_matrix(desc1, desc2)
    if mask1 is not None:
        dmat = jnp.where(mask1[:, None], dmat, BIG)
    if mask2 is not None:
        dmat = jnp.where(mask2[None, :], dmat, BIG)

    idx2 = jnp.argmin(dmat, axis=1)
    dist = jnp.take_along_axis(dmat, idx2[:, None], axis=1)[:, 0]
    matched = dist < BIG
    if cross_check:
        idx1 = jnp.argmin(dmat, axis=0)     # best row for each column
        mutual = idx1[idx2] == jnp.arange(desc1.shape[0])
        matched = matched & mutual
    if threshold is not None:
        matched = matched & (dist < threshold)
    return idx2.astype(jnp.int32), dist, matched


@partial(jax.jit, static_argnames=())
def knn2_match(desc1, desc2, mask1=None, mask2=None, ratio=0.9):
    """2-NN matching with Lowe's ratio test (reference matching.py:21-28:
    knnMatch(k=2) + m.distance < ratio * n.distance).

    Returns (idx2, dist, matched) like mnn_match.
    """
    BIG = jnp.float32(1e9)
    dmat = descriptor_distance_matrix(desc1, desc2)
    if mask1 is not None:
        dmat = jnp.where(mask1[:, None], dmat, BIG)
    if mask2 is not None:
        dmat = jnp.where(mask2[None, :], dmat, BIG)
    neg_top2, idx_top2 = jax.lax.top_k(-dmat, 2)
    d1, d2 = -neg_top2[:, 0], -neg_top2[:, 1]
    matched = (d1 < BIG) & (d1 < ratio * d2)
    return idx_top2[:, 0].astype(jnp.int32), d1, matched


@jax.jit
def threshold_match(desc1, desc2, mask1=None, mask2=None, threshold=0.4):
    """All pairs below an absolute L2 threshold (reference ThresholdMatcher,
    matching.py:77-102). Returns the boolean (N1, N2) match matrix plus the
    distance matrix; the host enumerates pairs."""
    BIG = jnp.float32(1e9)
    dmat = descriptor_distance_matrix(desc1, desc2)
    if mask1 is not None:
        dmat = jnp.where(mask1[:, None], dmat, BIG)
    if mask2 is not None:
        dmat = jnp.where(mask2[None, :], dmat, BIG)
    return dmat < threshold, dmat


def matches_to_list(idx2, dist, matched):
    """Convert device match arrays to a host list of (i1, i2, distance)
    tuples ordered like cv2 matches (ascending query index)."""
    import numpy as np
    idx2 = np.asarray(idx2)
    dist = np.asarray(dist)
    matched = np.asarray(matched)
    return [(int(i), int(idx2[i]), float(dist[i]))
            for i in np.nonzero(matched)[0]]

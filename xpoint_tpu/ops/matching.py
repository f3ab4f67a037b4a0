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
    dots = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32,
                   precision="highest")
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


def matches_to_list(idx2, dist, matched):
    """Convert device match arrays to a host list of (i1, i2, distance)
    tuples ordered like cv2 matches (ascending query index)."""
    import numpy as np
    idx2 = np.asarray(idx2)
    dist = np.asarray(dist)
    matched = np.asarray(matched)
    return [(int(i), int(idx2[i]), float(dist[i]))
            for i in np.nonzero(matched)[0]]

"""Inference wrapper used by the evaluation loops and CLIs.

Bridges the static-shape device world and the dynamic-count metric world:
heatmaps/descriptor maps are computed in one jit program; keypoint
extraction for metrics happens host-side with exact reference semantics
(torch.nonzero -> np.argwhere), then descriptors are sampled on device at
padded fixed-size keypoint sets.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.detector import prob_from_logits, refine_keypoints_subpixel
from ..ops.nms import box_nms
from ..ops.descriptor import interpolate_descriptors
from ..ops.matching import (mnn_match, knn2_match, threshold_match,
                            matches_to_list)


class XPointInference:
    def __init__(self, module, variables, prediction_config=None, max_kp=4096):
        self.module = module
        self.variables = variables
        self.cfg = dict({'nms': 8, 'detection_threshold': 0.015, 'topk': 0,
                         'cpu_nms': False, 'subpixel': False},
                        **(prediction_config or {}))
        # XPoint-TPU extension (reference keypoints are integer argwhere
        # rows): quadratic-peak subpixel refinement on the raw heatmap
        self.subpixel = bool(self.cfg.get('subpixel', False))
        self._refine = jax.jit(refine_keypoints_subpixel)
        self.max_kp = max_kp
        # module is None for host-side baseline models (ClassicInference):
        # they bring their own forward; everything below (nms, descriptor
        # sampling, matching) is shared so the metric pipeline is identical
        if module is not None:
            self.ratio = module.encoder_downsample_ratio

            @jax.jit
            def _forward_pair(variables, img_o, img_t):
                pred_o, pred_t, pred_hm = module.apply(
                    variables, img_o, img_t, method=module.forward_pair)
                return (prob_from_logits(pred_o['logits'], self.ratio),
                        prob_from_logits(pred_t['logits'], self.ratio),
                        pred_o['desc'], pred_t['desc'], pred_hm)
            self._forward_pair = _forward_pair

            @jax.jit
            def _forward_single(variables, img, is_optical):
                pred = module.apply(variables, img, "mixed", is_optical)
                return (prob_from_logits(pred['logits'], self.ratio),
                        pred['desc'])
            self._forward_single = _forward_single

        nms_size = self.cfg['nms']
        thr = float(self.cfg['detection_threshold'])
        topk = int(self.cfg.get('topk') or 0)

        @jax.jit
        def _nms(prob):
            if nms_size > 0:
                return jax.vmap(lambda p: box_nms(p, nms_size, thr,
                                                  keep_top_k=topk))(prob)
            return prob
        self._nms = _nms

        @partial(jax.jit, static_argnames=("image_shape",))
        def _interp(kps, mask, desc_map, image_shape):
            d = interpolate_descriptors(kps, desc_map, image_shape)
            return d * mask[:, None]
        self._interp = _interp

        # matching method from the prediction config (reference get_matches
        # dispatch, matching.py:4-36): bfmatcher/nnmatcher with crossCheck or
        # threshold, optional kNN + Lowe ratio 0.9, thresholdmatcher.
        mcfg = self.cfg.get('matching') or {}
        method = mcfg.get('method', 'bfmatcher')
        kwargs = mcfg.get('method_kwargs') or {}
        knn = bool(mcfg.get('knn_matches', False))
        self._threshold_mode = (method == 'thresholdmatcher')
        if knn:
            @jax.jit
            def _match(d1, d2, m1, m2):
                return knn2_match(d1, d2, m1, m2, ratio=0.9)
        elif self._threshold_mode:
            match_thr = float(kwargs.get('threshold', 0.4))

            @jax.jit
            def _match(d1, d2, m1, m2):
                return threshold_match(d1, d2, m1, m2, match_thr)
        else:
            cross = bool(kwargs.get('crossCheck', method == 'bfmatcher'))
            match_thr = kwargs.get('threshold')
            if method == 'nnmatcher':
                match_thr = float(kwargs.get('threshold', 0.7))
                cross = True
            elif method == 'flann':
                # reference 'flann' = cv2.FlannBasedMatcher (KDTree
                # APPROXIMATE nearest neighbor, no cross-check,
                # matching.py:10-19). On device we run the EXACT
                # nearest-neighbor equivalent — a strict superset of what
                # the KDTree approximates — announced, not silent.
                cross = False
                match_thr = None
                print("matching method 'flann': using exact on-device "
                      "nearest-neighbor (cv2 FLANN is an approximate NN; "
                      "exact NN dominates it)", flush=True)

            @jax.jit
            def _match(d1, d2, m1, m2):
                return mnn_match(d1, d2, m1, m2, threshold=match_thr,
                                 cross_check=cross)
        self._match = _match

        @jax.jit
        def _match_pr(d1, d2, m1, m2):
            return mnn_match(d1, d2, m1, m2, cross_check=True)
        self._match_pr = _match_pr

    def takes_pair(self):
        return True

    # ---- heatmaps ----
    def forward_pair(self, img_o, img_t):
        """images (B, H, W, 1) numpy -> numpy (prob_o, prob_t, desc_o,
        desc_t, pred_hm)."""
        out = self._forward_pair(self.variables, jnp.asarray(img_o),
                                 jnp.asarray(img_t))
        return [None if o is None else np.asarray(o) for o in out]

    def forward_single(self, img, is_optical):
        out = self._forward_single(self.variables, jnp.asarray(img),
                                   jnp.asarray(is_optical).reshape(-1))
        return [np.asarray(o) for o in out]

    def nms(self, prob):
        return np.asarray(self._nms(jnp.asarray(prob)))

    # ---- dynamic-count helpers (host <-> padded device) ----
    def keypoints_from_prob(self, prob_nms, valid_mask=None, prob_raw=None):
        """Host threshold + nonzero, exact reference semantics
        (evaluation.py:160-161, 281-282).

        With `subpixel: true` in the prediction config AND the pre-NMS
        heatmap passed as prob_raw, the integer keypoints are refined by
        quadratic peak interpolation (ops/detector.py) and returned as
        float32 — every downstream consumer (warps, descriptor sampling,
        MAGSAC) already takes float coords."""
        p = prob_nms
        if valid_mask is not None:
            p = p * valid_mask
        kps = np.argwhere(p > float(self.cfg['detection_threshold']))
        if not self.subpixel or prob_raw is None or len(kps) == 0:
            return kps
        k = self._capacity(len(kps))
        padded = np.zeros((k, 2), np.int32)
        padded[:len(kps)] = kps
        mask = np.zeros((k,), bool)
        mask[:len(kps)] = True
        refined = self._refine(jnp.asarray(prob_raw, jnp.float32),
                               jnp.asarray(padded), jnp.asarray(mask))
        return np.asarray(refined)[:len(kps)]

    def _capacity(self, n):
        """Static pad size for n dynamic keypoints: grows max_kp by powers
        of two so NO keypoint is ever silently dropped from the metric path
        (each new capacity costs one jit recompile, then is reused)."""
        k = self.max_kp
        while k < n:
            k *= 2
        if k > self.max_kp:
            import warnings
            warnings.warn(f"{n} keypoints exceed max_kp={self.max_kp}; "
                          f"growing device capacity to {k} (one-time jit "
                          f"recompile at this size)")
            self.max_kp = k
        return k

    def descriptors_at(self, keypoints, desc_map, image_shape):
        """Sample L2-normed descriptors at (n, 2) host keypoints."""
        n = len(keypoints)
        k = self._capacity(n)
        kps = np.zeros((k, 2), np.float32)
        kps[:n] = keypoints
        mask = np.zeros((k,), bool)
        mask[:n] = True
        d = self._interp(jnp.asarray(kps), jnp.asarray(mask),
                         jnp.asarray(desc_map), tuple(image_shape))
        return np.asarray(d)[:n]

    def match_crosscheck(self, desc1, desc2):
        """Always cross-checked MNN (the reference hard-codes BFMatcher
        crossCheck=True for the NN-mAP/M-score matches, evaluation.py:286-301,
        independent of the configured matcher)."""
        return self._match_host(desc1, desc2, self._match_pr, False)

    def match(self, desc1, desc2):
        """Config-selected matcher (used for homography estimation like the
        reference, evaluation.py:351-357)."""
        return self._match_host(desc1, desc2, self._match,
                                self._threshold_mode)

    def _match_host(self, desc1, desc2, fn, threshold_mode):
        n1, n2 = len(desc1), len(desc2)
        if n1 == 0 or n2 == 0:
            return []
        D = desc1.shape[1]
        k = self._capacity(max(n1, n2))
        d1 = np.zeros((k, D), np.float32)
        d2 = np.zeros((k, D), np.float32)
        d1[:n1] = desc1
        d2[:n2] = desc2
        m1 = np.zeros((k,), bool)
        m2 = np.zeros((k,), bool)
        m1[:n1] = True
        m2[:n2] = True
        out = fn(jnp.asarray(d1), jnp.asarray(d2),
                 jnp.asarray(m1), jnp.asarray(m2))
        if threshold_mode:
            match_mat, dmat = np.asarray(out[0]), np.asarray(out[1])
            ii, jj = np.nonzero(match_mat[:n1, :n2])
            return [(int(i), int(j), float(dmat[i, j]))
                    for i, j in zip(ii, jj)]
        return matches_to_list(*out)


class ClassicInference(XPointInference):
    """Benchmark adapter for the classical baselines (SIFT/SURF/LGHD/RIFT2).

    The reference runs ClassicDetectors through the SAME benchmark script
    as the learned models (`getattr(models, type)(config)`, reference
    benchmark.py:93, with `-v none` skipping weight loading, :94-96); this
    is the equivalent hook. The forward is the host-side cv2 model (sparse
    prob/desc maps); NMS, descriptor sampling, matching, and every metric
    downstream reuse XPointInference's device programs unchanged, so
    baseline and learned-model numbers are produced by byte-identical
    metric code.
    """

    def __init__(self, model, prediction_config=None, max_kp=4096):
        super().__init__(None, None, prediction_config, max_kp)
        self.model = model

    def takes_pair(self):
        return bool(self.model.takes_pair())

    # timing-harness hook: same positional surface as the jitted program
    # (variables ignored — the model is host-side state)
    def _forward_pair(self, variables, img_o, img_t):
        out_o = self.model({'image': np.asarray(img_o)})
        out_t = self.model({'image': np.asarray(img_t)})
        desc_o, desc_t = out_o['desc'], out_t['desc']
        # a side with zero detections returns a depth-1 placeholder plane
        # (models/classic.py); pad so the descriptor metrics see one depth
        if desc_o.shape[-1] != desc_t.shape[-1]:
            depth = max(desc_o.shape[-1], desc_t.shape[-1])

            def _pad(d):
                return np.pad(d, [(0, 0)] * (d.ndim - 1)
                              + [(0, depth - d.shape[-1])])
            desc_o, desc_t = _pad(desc_o), _pad(desc_t)
        return (out_o['prob'], out_t['prob'], desc_o, desc_t, None)

    def forward_pair(self, img_o, img_t):
        return list(self._forward_pair(None, img_o, img_t))

    def forward_single(self, img, is_optical):
        out = self.model({'image': np.asarray(img)})
        return [out['prob'], out['desc']]

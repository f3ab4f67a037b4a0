"""XPoint training losses in JAX, shape-static and vmap/pjit friendly.

Parity target: /root/reference/xpoint/utils/losses.py.
  detector loss   :374-576  space_to_depth(8) labels -> 65-class CE/focal,
                            hard (random tiebreak) or soft assignment,
                            valid-mask x per-sample normalization
  descriptor loss :579-757  dense cell-center hinge with homography-warped
                            correspondence (<= threshold), valid-mask outer
                            product; sparse variant samples Hc*Wc/div cells
  hm loss         :356-361  MSE on the L2-normalized 8-vector
  encoder sim     :363-370  1 - cosine similarity of flattened features

Config schema identical to the reference `loss:` YAML section
(losses.py:148-175). All functions return (loss, components-dict).
"""
import copy

import jax
import jax.numpy as jnp

from ..utils import dict_update
from ..ops.gridops import space_to_depth
from ..geometry.homography import warp_points


DEFAULT_CONFIG = {
    'detector_loss': True,
    'detector_loss_function': 'cross_entropy',  # 'focal_loss', 'cross_entropy_focal_blended'
    'detector_handle_multiple_keypoints': 'soft_assignment',
    'detector_dustbin_loss_weight': 1.0,
    'detector_focal_loss': {'use': True, 'alpha': 0.25, 'gamma': 2.0},
    'descriptor_loss': True,
    'descriptor_loss_threshold': 8.0,
    'sparse_descriptor_loss': False,
    'sparse_descriptor_loss_num_cell_divisor': 64,
    'descriptor_loss_use_mask': True,
    'positive_margin': 1.0,
    'negative_margin': 0.2,
    'lambda_d': 250,
    'lambda': 0.0001,
    # XPoint-TPU extension (default off = reference parity: uniform
    # negative averaging, losses.py:729-744). When enabled, an additional
    # hard-negative term re-weights each anchor cell's negatives by
    # softmax(dot/temperature) over the valid non-corresponding cells
    # (both anchor directions, averaged) — easy negatives with hinge 0
    # stop diluting the gradient, the hardest (most confusable) cells
    # dominate it. 'weight' scales the term; 'keep_uniform' keeps the
    # reference uniform term alongside (off = replace it).
    'hard_negative_weighting': {'check': False, 'temperature': 0.1,
                                'weight': 0.2, 'keep_uniform': True},
    'space_to_depth_ratio': 8,
    'use_encoder_similarity': False,
    'homography_regression_loss': {'check': False, 'gamma': 1.0},
}


def _weighted_ce(logits, target_probs, class_weights):
    """-sum_c w_c t_c log softmax_c per position (torch CrossEntropyLoss with
    probability targets + class weights, reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(class_weights * target_probs * logp, axis=-1)


def _focal(logits, target_probs, alpha, gamma):
    """FocalLoss (losses.py:16-49): ce -> pt=exp(-ce) -> alpha(1-pt)^g ce."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(target_probs * logp, axis=-1)
    pt = jnp.exp(-ce)
    return alpha * (1.0 - pt) ** gamma * ce


def detector_loss(logits, keypoint_map, valid_mask, config, rng=None):
    """Detector loss for one spectrum.

    Args:
        logits: (B, Hc, Wc, r^2+1) float32.
        keypoint_map: (B, H, W) bool/float ground-truth keypoint map.
        valid_mask: (B, H, W) bool/float or None.
        config: merged loss config.
        rng: PRNG key for the hard-assignment random tiebreak.
    """
    r = config['space_to_depth_ratio']
    n_classes = logits.shape[-1]
    labels = space_to_depth(keypoint_map.astype(jnp.float32), r)  # (B,Hc,Wc,r^2)

    if valid_mask is None:
        valid = jnp.ones(labels.shape[:-1], jnp.float32)
    else:
        vm = space_to_depth(valid_mask.astype(jnp.float32), r)
        valid = jnp.prod(vm, axis=-1)

    # hard assignment (random tiebreak, losses.py:421-423) — also used for
    # the diagnostic TP/FP ratios regardless of the training assignment
    if rng is None:
        rng = jax.random.PRNGKey(0)
    noise = jax.random.uniform(rng, labels.shape)
    hard = jnp.concatenate(
        [3.0 * labels + noise, 2.0 * jnp.ones(labels.shape[:-1] + (1,))], -1)
    labels_hard = jnp.argmax(hard, axis=-1)

    method = config['detector_handle_multiple_keypoints']
    if method == 'hard_assignment':
        target = jax.nn.one_hot(labels_hard, n_classes)
    elif method == 'soft_assignment':
        count = labels.sum(axis=-1, keepdims=True)
        soft = labels / (count + 1e-6)
        target = jnp.concatenate([soft, 1.0 - soft.sum(-1, keepdims=True)], -1)
    else:
        raise ValueError(f"unknown keypoint handling: {method}")

    fn = config['detector_loss_function']
    weights = jnp.array([1.0] * (n_classes - 1)
                        + [config['detector_dustbin_loss_weight']], jnp.float32)
    fl = config['detector_focal_loss']
    if fn == 'cross_entropy':
        loss_values = _weighted_ce(logits, target, weights)
    elif fn == 'focal_loss':
        loss_values = _focal(logits, target, fl['alpha'], fl['gamma'])
    elif fn == 'cross_entropy_focal_blended':
        # blend by keypoint-prediction ratio (losses.py:447-485)
        probs = jax.nn.softmax(logits, axis=-1)
        kp_sum = probs[..., :-1].sum(-1)
        binary = (kp_sum > probs[..., -1]).astype(jnp.float32)
        kp_ratio = binary.mean()
        threshold = 0.0015
        blend = jnp.clip((threshold - kp_ratio) / threshold, 0.0, 1.0)
        loss_values = ((1 - blend) * _weighted_ce(logits, target, weights)
                       + blend * _focal(logits, target, fl['alpha'], fl['gamma']))
    else:
        raise ValueError(f"unknown detector loss: {fn}")

    loss_values = loss_values * valid
    denom = jnp.maximum(valid.sum(axis=(1, 2)), 1.0)
    normalized = (loss_values.sum(axis=(1, 2)) / denom).mean()

    # diagnostics (losses.py:492-555). NOTE: multiplying the hard labels by
    # the valid mask maps masked-out cells to class 0 (a keypoint class),
    # skewing TP/FN under non-trivial masks — the reference does exactly
    # this (losses.py:490 labels_hard_assigned * valid_mask), so the quirk
    # is kept deliberately for parity of the reported ratios.
    pred_cls = jnp.argmax(logits, axis=-1)
    hard_masked = (labels_hard * valid).astype(jnp.int32)
    total = hard_masked.size
    dustbin = n_classes - 1
    tp = jnp.sum((pred_cls <= dustbin - 1) & (hard_masked <= dustbin - 1))
    fp = jnp.sum((pred_cls <= dustbin - 1) & (hard_masked == dustbin))
    fnn = jnp.sum((pred_cls == dustbin) & (hard_masked <= dustbin - 1))
    tn = jnp.sum((pred_cls == dustbin) & (hard_masked == dustbin))
    components = {
        'detector_loss': loss_values.mean(),
        'detector_normalized_loss': normalized,
        'correct_ratio': jnp.mean((pred_cls == hard_masked).astype(jnp.float32)),
        'TP_ratio': tp / total, 'FP_ratio': fp / total,
        'FN_ratio': fnn / total, 'TN_ratio': tn / total,
    }
    return normalized, components


def descriptor_loss(desc1, desc2, homography1, homography2,
                    valid_mask1, valid_mask2, config, rng=None):
    """Descriptor hinge loss. desc: (B, Hc, Wc, D) L2-normalized.

    Dense mode (losses.py:688-756): cell centers (i*8+4), warped by H^-1,
    correspondence = pairwise distance <= threshold; hinge on the (B, Hc,
    Wc, Hc, Wc) dot-product volume (a single MXU batched matmul on TPU).
    """
    B, Hc, Wc, D = desc1.shape
    r = config['space_to_depth_ratio']
    pos_margin = config['positive_margin']
    neg_margin = config['negative_margin']
    lambda_d = config['lambda_d']

    if config['sparse_descriptor_loss']:
        num_cells = int((Hc * Wc) // config['sparse_descriptor_loss_num_cell_divisor'])
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)
        cells = jnp.stack([jax.random.randint(r1, (num_cells,), 0, Hc),
                           jax.random.randint(r2, (num_cells,), 0, Wc)], -1)
        cells = jnp.broadcast_to(cells[None], (B, num_cells, 2)).astype(jnp.float32)

        w1 = warp_points(cells, homography1) if homography1 is not None else cells
        w2 = warp_points(cells, homography2) if homography2 is not None else cells

        dist = jnp.linalg.norm(cells[:, None, :, :] - cells[:, :, None, :], axis=-1)
        corr = (dist <= jnp.sqrt(0.5)).astype(jnp.float32)
        valid = (((w1[:, :, 0] > -0.5) & (w1[:, :, 0] < Hc - 0.5))[:, None, :]
                 & ((w2[:, :, 1] > -0.5) & (w2[:, :, 1] < Wc - 0.5))[:, :, None]
                 ).astype(jnp.float32)

        def clampi(idx, hi):
            return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, hi - 1)

        i1y, i1x = clampi(w1[..., 0], Hc), clampi(w1[..., 1], Wc)
        i2y, i2x = clampi(w2[..., 0], Hc), clampi(w2[..., 1], Wc)
        d1 = jax.vmap(lambda dm, y, x: dm[y, x])(desc1, i1y, i1x)  # (B,n,D)
        d2 = jax.vmap(lambda dm, y, x: dm[y, x])(desc2, i2y, i2x)
        dot = jnp.einsum("bnd,bmd->bnm", d2, d1,
                         preferred_element_type=jnp.float32)
        positive = lambda_d * corr * jnp.maximum(0.0, pos_margin - dot)
        neg_hinge = jnp.maximum(0.0, dot - neg_margin)
        negative = (1 - corr) * neg_hinge
        positive = positive * valid
        negative = negative * valid
        loss = positive + negative
        norm = jnp.maximum(valid.sum(axis=(1, 2)), 1.0)
        hn = config['hard_negative_weighting']
        hard = 0.0
        if hn.get('check'):
            # same softmax(dot/tau) hard-negative emphasis as the dense
            # path, on the sampled-cell matrix (both anchor directions)
            e = jnp.exp(dot / float(hn.get('temperature', 0.1))) \
                * (1 - corr) * valid
            e_num = e * neg_hinge

            def wmean(num, den, axis):
                d = den.sum(axis=axis)
                ok = d > 0.0
                # where() on both sides: see the dense path — max(den, eps)
                # alone lets the division's VJP overflow on empty anchors
                m = jnp.where(ok, num.sum(axis=axis) / jnp.where(ok, d, 1.0),
                              0.0)
                return m.sum(axis=1) / jnp.maximum(
                    ok.astype(jnp.float32).sum(axis=1), 1.0)
            hard = float(hn.get('weight', 0.2)) * 0.5 * (
                wmean(e_num, e, 2) + wmean(e_num, e, 1))
            if not hn.get('keep_uniform', True):
                loss = positive
                negative = jnp.zeros_like(negative)
        total = (loss.sum(axis=(1, 2)) / norm + hard).mean()
        pos = (positive.sum(axis=(1, 2)) / norm).mean()
        neg = (negative.sum(axis=(1, 2)) / norm + hard).mean()
        return total, pos, neg

    # ---- dense mode ----
    ys, xs = jnp.meshgrid(jnp.arange(Hc, dtype=jnp.float32),
                          jnp.arange(Wc, dtype=jnp.float32), indexing="ij")
    # cell centers use the hardcoded *8+4 of the reference (losses.py:690)
    centers = jnp.stack([ys, xs], -1) * 8.0 + 4.0                # (Hc,Wc,2)
    cells = jnp.broadcast_to(centers[None], (B, Hc, Wc, 2)).reshape(B, -1, 2)

    inv1 = jnp.linalg.inv(homography1) if homography1 is not None else None
    inv2 = jnp.linalg.inv(homography2) if homography2 is not None else None
    w1 = warp_points(cells, inv1).reshape(B, Hc, Wc, 2) if inv1 is not None \
        else cells.reshape(B, Hc, Wc, 2)
    w2 = warp_points(cells, inv2).reshape(B, Hc, Wc, 2) if inv2 is not None \
        else cells.reshape(B, Hc, Wc, 2)

    # pairwise hinge over all (cell2, cell1) pairs — the reference
    # materializes the full (B, Hc, Wc, Hc, Wc) broadcast
    # (losses.py:706-713), which is 64^4 = 16.8M floats/sample at 512^2.
    # We stream chunks of the cell2 axis through a scan instead: identical
    # sums (fp32 accumulation), peak memory (B, G, Hc*Wc) per chunk, so
    # 512^2 pair training fits at production batch sizes.
    N = Hc * Wc
    D = desc1.shape[-1]
    d1f = desc1.reshape(B, N, D)
    d2f = desc2.reshape(B, N, D)
    w1f = w1.reshape(B, N, 2)
    w2f = w2.reshape(B, N, 2)

    if config['descriptor_loss_use_mask']:
        def cell_mask(vm):
            if vm is None:
                return jnp.ones((B, Hc, Wc), jnp.float32)
            m = space_to_depth(vm.astype(jnp.float32), r)
            return jnp.prod(m, axis=-1)
        m1 = cell_mask(valid_mask1).reshape(B, N)
        m2 = cell_mask(valid_mask2).reshape(B, N)
    else:
        m1 = m2 = None

    G = N
    for g in range(min(512, N), 0, -1):        # largest chunk <= 512
        if N % g == 0:
            G = g
            break
    nc = N // G
    thr = config['descriptor_loss_threshold']

    def to_chunks(x):
        return x.reshape(B, nc, G, *x.shape[2:]).transpose(
            1, 0, 2, *range(3, x.ndim + 1))

    chunks = (to_chunks(d2f), to_chunks(w2f),
              to_chunks(m2) if m2 is not None else jnp.zeros((nc,)))

    hn = config['hard_negative_weighting']
    hn_on = bool(hn.get('check'))
    hn_tau = float(hn.get('temperature', 0.1))

    def body(acc, inp):
        t_sum, p_sum, n_sum, v_sum, row_s, row_c, col_n, col_d = acc
        d2c, w2c, m2c = inp                                   # (B, G, ...)
        dist = jnp.linalg.norm(
            w2c[:, :, None, :] - w1f[:, None, :, :], axis=-1)  # (B, G, N)
        corr = (dist <= thr).astype(jnp.float32)
        dot = jnp.einsum("bgd,bnd->bgn", d2c, d1f,
                         preferred_element_type=jnp.float32)
        positive = lambda_d * corr * jnp.maximum(0.0, pos_margin - dot)
        neg_hinge = jnp.maximum(0.0, dot - neg_margin)
        negative = (1 - corr) * neg_hinge
        if m2 is not None:
            vm = m2c[:, :, None] * m1[:, None, :]
            positive = positive * vm
            negative = negative * vm
            v_sum = v_sum + vm.sum(axis=(1, 2))
        else:
            vm = jnp.ones_like(corr)
        if hn_on:
            # softmax(dot/tau)-weighted negatives over valid
            # non-corresponding pairs, both anchor directions. Descriptors
            # are L2-normalized so |dot| <= 1 and exp(dot/tau) is bounded
            # by e^(1/tau) — accumulable across chunks without a running
            # max. Rows (anchor = cell2) normalize within the chunk;
            # columns (anchor = cell1) carry (numerator, denominator) sums.
            e = jnp.exp(dot / hn_tau) * (1 - corr) * vm        # (B, G, N)
            e_num = e * neg_hinge
            r_num = e_num.sum(axis=2)                          # (B, G)
            r_den = e.sum(axis=2)
            r_ok = r_den > 0.0
            # safe divide: max(den, eps) is NOT enough — the VJP of x/den
            # carries 1/den^2, which overflows to inf (then inf*0 = nan)
            # for empty rows; where() on BOTH sides keeps the bwd finite
            row_s = row_s + jnp.where(
                r_ok, r_num / jnp.where(r_ok, r_den, 1.0), 0.0
            ).sum(axis=1)                                      # (B,)
            row_c = row_c + r_ok.astype(jnp.float32).sum(axis=1)
            col_n = col_n + e_num.sum(axis=1)                  # (B, N)
            col_d = col_d + e.sum(axis=1)
        p = positive.sum(axis=(1, 2))
        n = negative.sum(axis=(1, 2))
        return (t_sum + p + n, p_sum + p, n_sum + n, v_sum,
                row_s, row_c, col_n, col_d), None

    zero = jnp.zeros((B,), jnp.float32)
    zero_n = jnp.zeros((B, N), jnp.float32)
    (t_sum, p_sum, n_sum, v_sum, row_s, row_c, col_n, col_d), _ = \
        jax.lax.scan(body, (zero, zero, zero, zero,
                            zero, zero, zero_n, zero_n), chunks)

    if m2 is not None:
        norm = jnp.maximum(v_sum, 1.0)
    else:
        norm = float(N * N)
    if hn_on:
        row_mean = row_s / jnp.maximum(row_c, 1.0)
        c_ok = col_d > 0.0
        col_mean = jnp.where(
            c_ok, col_n / jnp.where(c_ok, col_d, 1.0), 0.0
        ).sum(axis=1) / jnp.maximum(c_ok.astype(jnp.float32).sum(axis=1), 1.0)
        hard = float(hn.get('weight', 0.2)) * 0.5 * (row_mean + col_mean)
        if not hn.get('keep_uniform', True):
            t_sum = t_sum - n_sum
            n_sum = jnp.zeros_like(n_sum)
        total = (t_sum / norm + hard).mean()
        pos = (p_sum / norm).mean()
        neg = (n_sum / norm + hard).mean()
        return total, pos, neg
    total = (t_sum / norm).mean()
    pos = (p_sum / norm).mean()
    neg = (n_sum / norm).mean()
    return total, pos, neg


class XPointLoss:
    """Callable aggregating all loss terms (losses.py:144-372)."""

    def __init__(self, config=None):
        self.config = dict_update(copy.deepcopy(DEFAULT_CONFIG), config or {})

    def __call__(self, data, pred, pred2=None, pred_hm=None, rng=None):
        """Args mirror the reference loss_input_dict:
            data: dict with 'optical'/'thermal' sub-dicts (keypoints (B,H,W),
                  valid_mask (B,H,W), homography (B,3,3)) and optionally
                  'hfour_points' (B,4,2); or a flat single-spectrum dict.
            pred/pred2: model outputs with 'logits'/'desc' (NHWC).
        Returns (loss, components).
        """
        cfg = self.config
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)

        d1 = data['optical'] if 'optical' in data else data
        d2 = data.get('thermal') if 'optical' in data else None

        loss = 0.0
        components = {}

        if cfg['detector_loss']:
            l1, c1 = detector_loss(pred['logits'], d1['keypoints'],
                                   d1.get('valid_mask'), cfg, r1)
            loss = loss + l1
            components.update({k + '1': v for k, v in c1.items()})
            if pred2 is not None:
                l2, c2 = detector_loss(pred2['logits'], d2['keypoints'],
                                       d2.get('valid_mask'), cfg, r2)
                loss = loss + l2
                components.update({k + '2': v for k, v in c2.items()})

        if cfg['descriptor_loss']:
            if pred2 is None:
                raise ValueError('descriptor loss requires two predictions')
            dl, pos, neg = descriptor_loss(
                pred['desc'], pred2['desc'],
                d1.get('homography'), d2.get('homography'),
                d1.get('valid_mask'), d2.get('valid_mask'), cfg, r3)
            components['descriptor_loss'] = dl
            components['positive_dist'] = pos
            components['negative_dist'] = neg
            loss = loss + cfg['lambda'] * dl

        if cfg['homography_regression_loss']['check'] and pred_hm is not None:
            gt = data['hfour_points'].reshape(-1, 8).astype(jnp.float32)
            gt = gt / jnp.maximum(jnp.linalg.norm(gt, axis=1, keepdims=True), 1e-12)
            hm_loss = jnp.mean((pred_hm - gt) ** 2)
            loss = loss + cfg['homography_regression_loss']['gamma'] * hm_loss
            components['homography_regression_loss'] = hm_loss

        if cfg['use_encoder_similarity']:
            a = pred['encoder_output'].reshape(pred['encoder_output'].shape[0], -1)
            b = pred2['encoder_output'].reshape(pred2['encoder_output'].shape[0], -1)
            cos = jnp.sum(a * b, -1) / jnp.maximum(
                jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-12)
            sim_loss = 1.0 - cos.mean()
            loss = loss + sim_loss
            components['encoder_similarity_loss'] = sim_loss

        return loss, components

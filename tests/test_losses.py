"""Loss parity tests against torch implementations of the reference formulas
(losses.py detector/descriptor/hm paths)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.losses import XPointLoss, detector_loss, descriptor_loss


def make_data(rng, B=2, H=32, W=32, r=8, D=16):
    Hc, Wc = H // r, W // r
    logits = rng.normal(size=(B, Hc, Wc, r * r + 1)).astype(np.float32)
    kp = (rng.uniform(size=(B, H, W)) > 0.98)
    vm = np.ones((B, H, W), np.float32)
    vm[:, :4] = 0.0
    desc1 = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    desc2 = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
    desc2 /= np.linalg.norm(desc2, axis=-1, keepdims=True)
    H1 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    H2 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    H2[:, 0, 2] = 3.0   # small x translation
    return logits, kp, vm, desc1, desc2, H1, H2


def torch_detector_ce_soft(logits, kp, vm, dustbin_w, r=8):
    """Reference detector loss: soft assignment + weighted CE
    (losses.py:398-430,443-444,563-572)."""
    import torch
    logits_t = torch.from_numpy(logits).permute(0, 3, 1, 2)
    kp_t = torch.from_numpy(kp.astype(np.float32)).unsqueeze(1)
    vm_t = torch.from_numpy(vm).unsqueeze(1)

    def s2d(x, bs):
        N, C, H, W = x.shape
        x = x.view(N, C, H // bs, bs, W // bs, bs)
        x = x.permute(0, 3, 5, 1, 2, 4).contiguous()
        return x.view(N, C * bs * bs, H // bs, W // bs)

    labels = s2d(kp_t, r)
    valid = torch.prod(s2d(vm_t, r), dim=1)
    count = labels.sum(dim=1, keepdim=True)
    soft = labels / (count + 1e-6)
    target = torch.cat([soft, 1 - soft.sum(dim=1, keepdim=True)], dim=1)
    w = torch.tensor([1.0] * (r * r) + [dustbin_w])
    ce = torch.nn.CrossEntropyLoss(weight=w, reduction='none')(logits_t, target)
    ce = ce * valid
    denom = valid.sum(dim=[1, 2]).clamp(min=1.0)
    return (ce.sum(dim=[1, 2]) / denom).mean().item()


def torch_descriptor_dense(desc1, desc2, H1, H2, vm1, vm2, cfg):
    """Reference dense descriptor loss (losses.py:688-756)."""
    import torch
    d1 = torch.from_numpy(desc1).permute(0, 3, 1, 2)
    d2 = torch.from_numpy(desc2).permute(0, 3, 1, 2)
    B, D, Hc, Wc = d1.shape
    r = cfg['space_to_depth_ratio']

    coord = torch.stack(torch.meshgrid(torch.arange(Hc), torch.arange(Wc),
                                       indexing='ij'), dim=-1).float()
    coord = coord * 8.0 + 4.0
    coord = coord.unsqueeze(0).expand(B, -1, -1, -1).clone()

    def warp(points, Hm):
        pts = points.reshape(B, -1, 2)
        w = torch.cat([pts.flip(-1), torch.ones(B, pts.shape[1], 1)], -1)
        w = torch.bmm(torch.from_numpy(Hm), w.permute(0, 2, 1)).permute(0, 2, 1)
        w = w[:, :, :2] / w[:, :, 2:]
        return w.flip(-1).reshape(B, Hc, Wc, 2)

    w1 = warp(coord, np.linalg.inv(H1))
    w2 = warp(coord, np.linalg.inv(H2))
    dist = (w1.unsqueeze(1).unsqueeze(1) - w2.unsqueeze(-2).unsqueeze(-2)).norm(dim=-1)
    corr = (dist <= cfg['descriptor_loss_threshold']).float()
    dot = torch.matmul(d2.view(B, D, -1).permute(0, 2, 1),
                       d1.view(B, D, -1)).view(B, Hc, Wc, Hc, Wc)
    positive = cfg['lambda_d'] * corr * torch.clamp(cfg['positive_margin'] - dot, min=0)
    negative = (1 - corr) * torch.clamp(dot - cfg['negative_margin'], min=0)
    loss = positive + negative

    def s2d_mask(vm):
        t = torch.from_numpy(vm).unsqueeze(1)
        N, C, H, W = t.shape
        t = t.view(N, C, H // r, r, W // r, r).permute(0, 3, 5, 1, 2, 4)
        t = t.contiguous().view(N, r * r, H // r, W // r)
        return torch.prod(t, dim=1)

    m1 = s2d_mask(vm1)
    m2 = s2d_mask(vm2)
    vmask = torch.matmul(m2.view(B, -1, 1), m1.view(B, 1, -1)).view(B, Hc, Wc, Hc, Wc)
    loss = loss * vmask
    norm = vmask.sum(dim=[1, 2, 3, 4])
    return (loss.sum(dim=[1, 2, 3, 4]) / norm).mean().item()


def test_detector_loss_matches_torch():
    rng = np.random.default_rng(0)
    logits, kp, vm, *_ = make_data(rng)
    cfg = dict(XPointLoss().config)
    cfg['detector_dustbin_loss_weight'] = 0.025
    ours, comps = detector_loss(jnp.asarray(logits), jnp.asarray(kp),
                                jnp.asarray(vm), cfg)
    ref = torch_detector_ce_soft(logits, kp, vm, 0.025)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_descriptor_loss_matches_torch():
    rng = np.random.default_rng(1)
    _, _, vm, desc1, desc2, H1, H2 = make_data(rng)
    cfg = dict(XPointLoss().config)
    cfg['descriptor_loss_threshold'] = 4.0
    ours, pos, neg = descriptor_loss(jnp.asarray(desc1), jnp.asarray(desc2),
                                     jnp.asarray(H1), jnp.asarray(H2),
                                     jnp.asarray(vm), jnp.asarray(vm), cfg)
    ref = torch_descriptor_dense(desc1, desc2, H1, H2, vm, vm, cfg)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-3)


def test_full_loss_runs_and_is_finite():
    rng = np.random.default_rng(2)
    logits, kp, vm, desc1, desc2, H1, H2 = make_data(rng)
    loss_fn = XPointLoss({'detector_loss_function': 'cross_entropy',
                          'detector_handle_multiple_keypoints': 'soft_assignment',
                          'lambda': 1.0, 'descriptor_loss_threshold': 4.0,
                          'homography_regression_loss': {'check': True, 'gamma': 1.0}})
    data = {
        'optical': {'keypoints': jnp.asarray(kp), 'valid_mask': jnp.asarray(vm),
                    'homography': jnp.asarray(H1)},
        'thermal': {'keypoints': jnp.asarray(kp), 'valid_mask': jnp.asarray(vm),
                    'homography': jnp.asarray(H2)},
        'hfour_points': jnp.asarray(rng.normal(size=(2, 4, 2)).astype(np.float32)),
    }
    pred = {'logits': jnp.asarray(logits), 'desc': jnp.asarray(desc1)}
    pred2 = {'logits': jnp.asarray(logits), 'desc': jnp.asarray(desc2)}
    pred_hm = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    loss, comps = loss_fn(data, pred, pred2, pred_hm, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert 'descriptor_loss' in comps and 'homography_regression_loss' in comps


def test_focal_loss_path():
    rng = np.random.default_rng(3)
    logits, kp, vm, *_ = make_data(rng)
    cfg = dict(XPointLoss().config)
    cfg['detector_loss_function'] = 'focal_loss'
    cfg['detector_handle_multiple_keypoints'] = 'hard_assignment'
    loss, _ = detector_loss(jnp.asarray(logits), jnp.asarray(kp),
                            jnp.asarray(vm), cfg, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_sparse_descriptor_loss_path():
    rng = np.random.default_rng(4)
    _, _, vm, desc1, desc2, H1, H2 = make_data(rng)
    cfg = dict(XPointLoss().config)
    cfg['sparse_descriptor_loss'] = True
    cfg['sparse_descriptor_loss_num_cell_divisor'] = 4
    loss, pos, neg = descriptor_loss(jnp.asarray(desc1), jnp.asarray(desc2),
                                     jnp.asarray(H1), jnp.asarray(H2),
                                     jnp.asarray(vm), jnp.asarray(vm), cfg,
                                     jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def _naive_dense_hard_negative(desc1, desc2, H1, H2, vm, cfg):
    """Straight O(N^2) dense-matrix version of the hard-negative-weighted
    hinge (no chunking) — oracle for the lax.scan accumulation."""
    B, Hc, Wc, D = desc1.shape
    N = Hc * Wc
    ys, xs = np.meshgrid(np.arange(Hc, dtype=np.float32),
                         np.arange(Wc, dtype=np.float32), indexing='ij')
    centers = (np.stack([ys, xs], -1) * 8.0 + 4.0).reshape(-1, 2)

    def warp(pts, Hm):
        hom = np.concatenate([pts[:, ::-1], np.ones((N, 1))], -1)
        out = hom @ np.linalg.inv(Hm).T
        return (out[:, :2] / out[:, 2:])[:, ::-1]

    def cellmask(v):
        r = cfg['space_to_depth_ratio']
        m = v.reshape(B, Hc, r, Wc, r).transpose(0, 1, 3, 2, 4)
        return m.reshape(B, N, r * r).prod(-1)

    m1 = m2 = cellmask(vm)
    # warp() applies inv(Hm) to (x, y, 1), i.e. the source's
    # warp_points(cells, inv(homography)) path
    w1 = np.stack([warp(centers, H1[b]) for b in range(B)])
    w2 = np.stack([warp(centers, H2[b]) for b in range(B)])
    dist = np.linalg.norm(w2[:, :, None] - w1[:, None, :], axis=-1)
    corr = (dist <= cfg['descriptor_loss_threshold']).astype(np.float32)
    dot = np.einsum('bgd,bnd->bgn', desc2.reshape(B, N, D),
                    desc1.reshape(B, N, D))
    vmm = m2[:, :, None] * m1[:, None, :]
    pos = cfg['lambda_d'] * corr * np.maximum(0, cfg['positive_margin'] - dot)
    neg_h = np.maximum(0.0, dot - cfg['negative_margin'])
    neg = (1 - corr) * neg_h * vmm
    norm = np.maximum(vmm.sum((1, 2)), 1.0)

    hn = cfg['hard_negative_weighting']
    e = np.exp(dot / hn['temperature']) * (1 - corr) * vmm
    en = e * neg_h

    def wmean(axis):
        den = e.sum(axis)
        v = (den > 0).astype(np.float32)
        m = np.where(den > 0, en.sum(axis) / np.maximum(den, 1e-20), 0.0)
        return (m * v).sum(1) / np.maximum(v.sum(1), 1.0)

    hard = hn['weight'] * 0.5 * (wmean(2) + wmean(1))
    base = ((pos * vmm).sum((1, 2)) + neg.sum((1, 2))) / norm
    if not hn.get('keep_uniform', True):
        base = (pos * vmm).sum((1, 2)) / norm
    return float((base + hard).mean())


def test_descriptor_hard_negative_dense_matches_naive():
    # H=192 -> Hc=24, N=576 > 512 so the chunked scan runs 2 chunks and the
    # cross-chunk column accumulation is actually exercised
    rng = np.random.default_rng(5)
    B, H, W, r, D = 2, 192, 192, 8, 16
    Hc = H // r
    vm = np.ones((B, H, W), np.float32)
    vm[:, :24] = 0.0
    d1 = rng.normal(size=(B, Hc, Hc, D)).astype(np.float32)
    d2 = rng.normal(size=(B, Hc, Hc, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    H1 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    H2 = H1.copy()
    H2[:, 0, 2] = 5.0
    cfg = dict(XPointLoss().config)
    cfg['descriptor_loss_threshold'] = 4.0
    cfg['hard_negative_weighting'] = {'check': True, 'temperature': 0.1,
                                      'weight': 0.3, 'keep_uniform': True}
    ours, pos, neg = descriptor_loss(jnp.asarray(d1), jnp.asarray(d2),
                                     jnp.asarray(H1), jnp.asarray(H2),
                                     jnp.asarray(vm), jnp.asarray(vm), cfg)
    ref = _naive_dense_hard_negative(d1, d2, H1, H2, vm, cfg)
    np.testing.assert_allclose(float(ours), ref, rtol=2e-4)
    # replace-uniform mode drops the uniform negative term
    cfg['hard_negative_weighting']['keep_uniform'] = False
    ours2, _, _ = descriptor_loss(jnp.asarray(d1), jnp.asarray(d2),
                                  jnp.asarray(H1), jnp.asarray(H2),
                                  jnp.asarray(vm), jnp.asarray(vm), cfg)
    ref2 = _naive_dense_hard_negative(d1, d2, H1, H2, vm, cfg)
    np.testing.assert_allclose(float(ours2), ref2, rtol=2e-4)
    assert float(ours2) < float(ours)


def test_descriptor_hard_negative_sparse_finite():
    rng = np.random.default_rng(6)
    _, _, vm, desc1, desc2, H1, H2 = make_data(rng)
    cfg = dict(XPointLoss().config)
    cfg['sparse_descriptor_loss'] = True
    cfg['sparse_descriptor_loss_num_cell_divisor'] = 4
    cfg['hard_negative_weighting'] = {'check': True, 'temperature': 0.1,
                                      'weight': 0.3, 'keep_uniform': True}
    loss, pos, neg = descriptor_loss(jnp.asarray(desc1), jnp.asarray(desc2),
                                     jnp.asarray(H1), jnp.asarray(H2),
                                     jnp.asarray(vm), jnp.asarray(vm), cfg,
                                     jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    cfg['hard_negative_weighting']['check'] = False
    base, _, _ = descriptor_loss(jnp.asarray(desc1), jnp.asarray(desc2),
                                 jnp.asarray(H1), jnp.asarray(H2),
                                 jnp.asarray(vm), jnp.asarray(vm), cfg,
                                 jax.random.PRNGKey(2))
    assert float(loss) > float(base)   # hard term adds mass


def test_sparse_descriptor_loss_matches_numpy_oracle_512_shape():
    """Sparse descriptor loss (reference losses.py:613-685 semantics) at
    the 512^2 production cell grid (Hc=Wc=64): numpy oracle on the SAME
    sampled cells (the jax.random draw is re-derived from the same key)."""
    rng = np.random.default_rng(7)
    B, Hc, Wc, D = 2, 64, 64, 32
    d1 = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    d2 = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    H1 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    H2 = H1.copy()
    H2[:, 1, 2] = 7.0
    cfg = dict(XPointLoss().config)
    cfg['sparse_descriptor_loss'] = True
    cfg['sparse_descriptor_loss_num_cell_divisor'] = 64   # production value
    key = jax.random.PRNGKey(11)
    ours, pos, neg = descriptor_loss(jnp.asarray(d1), jnp.asarray(d2),
                                     jnp.asarray(H1), jnp.asarray(H2),
                                     None, None, cfg, key)

    # ---- numpy oracle on identical cells ----
    num_cells = (Hc * Wc) // 64
    r1, r2 = jax.random.split(key)
    cells = np.stack([np.asarray(jax.random.randint(r1, (num_cells,), 0, Hc)),
                      np.asarray(jax.random.randint(r2, (num_cells,), 0, Wc))],
                     -1).astype(np.float32)
    cells_b = np.broadcast_to(cells[None], (B, num_cells, 2))

    def warp(pts, Hm):
        hom = np.concatenate([pts[:, ::-1], np.ones((len(pts), 1))], -1)
        out = hom @ Hm.T
        return (out[:, :2] / out[:, 2:])[:, ::-1]

    w1 = np.stack([warp(cells_b[b], H1[b]) for b in range(B)])
    w2 = np.stack([warp(cells_b[b], H2[b]) for b in range(B)])
    dist = np.linalg.norm(cells_b[:, None] - cells_b[:, :, None], axis=-1)
    corr = (dist <= np.sqrt(0.5)).astype(np.float32)
    valid = (((w1[:, :, 0] > -0.5) & (w1[:, :, 0] < Hc - 0.5))[:, None, :]
             & ((w2[:, :, 1] > -0.5) & (w2[:, :, 1] < Wc - 0.5))[:, :, None]
             ).astype(np.float32)
    ci1 = (np.clip(np.round(w1[..., 0]), 0, Hc - 1).astype(int),
           np.clip(np.round(w1[..., 1]), 0, Wc - 1).astype(int))
    ci2 = (np.clip(np.round(w2[..., 0]), 0, Hc - 1).astype(int),
           np.clip(np.round(w2[..., 1]), 0, Wc - 1).astype(int))
    g1 = np.stack([d1[b][ci1[0][b], ci1[1][b]] for b in range(B)])
    g2 = np.stack([d2[b][ci2[0][b], ci2[1][b]] for b in range(B)])
    dot = np.einsum('bnd,bmd->bnm', g2, g1)
    positive = cfg['lambda_d'] * corr * np.maximum(
        0, cfg['positive_margin'] - dot) * valid
    negative = (1 - corr) * np.maximum(
        0, dot - cfg['negative_margin']) * valid
    norm = np.maximum(valid.sum((1, 2)), 1.0)
    expected = ((positive + negative).sum((1, 2)) / norm).mean()
    np.testing.assert_allclose(float(ours), expected, rtol=1e-4)

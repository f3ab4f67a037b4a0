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

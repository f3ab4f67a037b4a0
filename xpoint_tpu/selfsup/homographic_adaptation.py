"""Homographic adaptation: self-supervised pseudo-ground-truth keypoints.

Parity target: reference xpoint/utils/homographies.py:40-300 —
  * run the detector on the original optical/thermal pair, aggregate the two
    probability maps (prod / sum / window),
  * for each of num-1 random homographies: warp both images, re-run the
    detector, un-warp the probabilities, accumulate count-weighted,
  * prod -> sqrt, sum -> x0.5; zero out where count < min_count,
  * 'window' mode cross-checks keypoints within a k x k window between the
    two spectra (search_window, homographies.py:203-229).

TPU re-design: homographies + valid masks are sampled on the host up front;
the whole warp -> forward -> unwarp -> accumulate loop runs as ONE jitted
lax.scan over the stacked homographies (the reference launches 2(num-1)
separate forward passes with host round-trips per iteration,
export_keypoints.py:162-256).
"""
import copy
from functools import partial
from math import pi

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import dict_update
from ..geometry.homography import (sample_homography, compute_valid_mask,
                                   compute_valid_mask_device)
from ..ops.warp import warp_image_batch, warp_image_multi
from ..ops.warp_tiled import warp_image_multi_tiled, warp_image_batch_tiled


def _warp_multi(images, Hmats, mode, padding_mode):
    """HA warp dispatch: the tiled two-pass resampler when the spatial size
    allows (multiple of its tile; XLA's gather path is ~1000x off roofline
    on TPU), the exact gather warp otherwise."""
    H, W = images.shape[1:3]
    if H % 32 == 0 and W % 32 == 0:
        return warp_image_multi_tiled(images, Hmats, mode, padding_mode)
    return warp_image_multi(images, Hmats, mode, padding_mode)


def _warp_batch(images, Hmats, mode, padding_mode):
    H, W = images.shape[1:3]
    if H % 32 == 0 and W % 32 == 0:
        return warp_image_batch_tiled(images, Hmats, mode, padding_mode)
    return warp_image_batch(images, Hmats, mode, padding_mode)


HA_DEFAULT_CONFIG = {
    'num': 100,
    'aggregation': 'prod',
    'homographies': {
        'translation': True, 'rotation': True, 'scaling': True,
        'perspective': True, 'scaling_amplitude': 0.15,
        'perspective_amplitude_x': 0.15, 'perspective_amplitude_y': 0.15,
        'patch_ratio': 0.9, 'max_angle': pi, 'allow_artifacts': True,
    },
    'erosion_radius': 5,
    'mask_border': True,
    'min_count': 2,
    'filter_size': 0,
    'weighted_window': True,
    'window_size': 5,
}


def search_window(prob1, prob2, window_size, weighted_window):
    """Cross-spectral window check (homographies.py:203-229): keep (and
    weight) each keypoint by the total probability mass of the OTHER
    spectrum within a window_size x window_size neighborhood.

    prob: (B, H, W). reduce_window == zero-pad + unfold + sum of the ref.
    """
    assert window_size % 2 == 1

    def window_sum(p):
        return jax.lax.reduce_window(
            p, 0.0, jax.lax.add,
            window_dimensions=(1, window_size, window_size),
            window_strides=(1, 1, 1),
            padding="SAME")

    f1 = window_sum(prob2) * prob1
    f2 = window_sum(prob1) * prob2
    if not weighted_window:
        f1 = (f1 > 0).astype(prob1.dtype)
        f2 = (f2 > 0).astype(prob2.dtype)
    return f1, f2


def _gaussian_kernel(size, sigma=None):
    if sigma is None:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    g = np.arange(size) - (size - 1) / 2.0
    gx, gy = np.meshgrid(g, g)
    k = np.exp(-(gx ** 2 + gy ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _smooth(prob, size):
    """Reflect-padded gaussian smoothing of (B, H, W) heatmaps
    (utils.py:194-227 + ReflectionPad2d in homographies.py:75-78)."""
    k = jnp.asarray(_gaussian_kernel(size))
    pad = (size - 1) // 2
    p = jnp.pad(prob, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    return jax.lax.conv_general_dilated(
        p[:, None], k[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]


def sample_ha_homographies(config, image_shape, rng=None, with_masks=True):
    """Host-side: stack of (num-1) homographies + eroded valid masks.

    with_masks=False skips the cv2 mask computation and returns masks=None;
    the jitted HA program then derives the masks on device
    (compute_valid_mask_device) instead of shipping num x H x W planes
    over the host->device link per sample.
    """
    num = config['num']
    Hs, masks = [], []
    for _ in range(max(num - 1, 0)):
        H = sample_homography(np.array(image_shape), rng=rng,
                              **config['homographies'])
        Hs.append(H.astype(np.float32))
        if with_masks:
            m = compute_valid_mask(tuple(image_shape), H,
                                   config['erosion_radius'],
                                   config['mask_border'])
            masks.append(m.astype(np.float32))
    if not Hs:
        return (np.zeros((0, 3, 3), np.float32),
                np.zeros((0,) + tuple(image_shape), np.float32)
                if with_masks else None)
    return np.stack(Hs), (np.stack(masks) if with_masks else None)


def make_ha_fn(prob_fn, config=None, warp_batch=8):
    """Build the jitted multispectral HA program.

    Args:
        prob_fn: (image (B,H,W,1), is_optical: bool) -> prob (B,H,W).
            Wraps the detector forward + cell softmax.
        config: HA config dict (merged over HA_DEFAULT_CONFIG).
        warp_batch: warps processed per scan step — each step runs the net
            on (warp_batch * B) images at once instead of the reference's
            one-warp-at-a-time loop (export_keypoints.py:162-256); the
            count-weighted accumulation is associative so results match.

    Returns fn(img_o, img_t, homographies (n,3,3), valid_masks (n,H,W)|None)
        -> dict with 'prob' (prod/sum modes) or 'prob_optical'/'prob_thermal'
        (window mode), matching the reference output dict. valid_masks=None
        computes the eroded masks on device (exact cv2 parity) — the fast
        path: only n 3x3 matrices cross the host->device link.
    """
    cfg = dict_update(copy.deepcopy(HA_DEFAULT_CONFIG), config or {})
    if cfg['num'] < 1:
        raise ValueError('num must be >= 1 for homographic adaptation')
    if cfg['filter_size'] % 2 == 0 and cfg['filter_size'] != 0:
        raise ValueError('filter_size must be odd')
    if cfg['aggregation'] == 'window' and cfg['filter_size'] > 0:
        raise ValueError('window aggregation requires filter_size == 0')

    run = jax.jit(partial(_ha_run_impl, prob_fn, cfg, warp_batch))
    return run, cfg


def _ha_run_impl(prob_fn, cfg, warp_batch, img_o, img_t, homographies,
                 valid_masks=None):
    """The HA program body (unjitted; make_ha_fn jits it, the sharded
    export wraps it in shard_map over the batch axis)."""
    agg = cfg['aggregation']
    fs = cfg['filter_size']

    def maybe_smooth(p):
        return _smooth(p, fs) if fs > 0 else p

    B = img_o.shape[0]
    n = homographies.shape[0]
    if valid_masks is None:
        valid_masks = compute_valid_mask_device(
            homographies, img_o.shape[1:3],
            cfg['erosion_radius'], cfg['mask_border'])
    wb = max(min(warp_batch, n), 1) if n else 1
    if n % wb != 0:
        # pad with identity homographies + ZERO masks (count 0 => inert)
        pad = wb - n % wb
        homographies = jnp.concatenate(
            [homographies,
             jnp.broadcast_to(jnp.eye(3, dtype=homographies.dtype),
                              (pad, 3, 3))], 0)
        valid_masks = jnp.concatenate(
            [valid_masks, jnp.zeros((pad,) + valid_masks.shape[1:],
                                    valid_masks.dtype)], 0)
    homographies = homographies.reshape(-1, wb, 3, 3)
    valid_masks = valid_masks.reshape((-1, wb) + valid_masks.shape[1:])
    prob_o = maybe_smooth(prob_fn(img_o, True))
    prob_t = maybe_smooth(prob_fn(img_t, False))
    count = jnp.ones_like(prob_o)

    if agg == 'prod':
        acc = prob_o * prob_t
        acc_o = acc_t = jnp.zeros_like(acc)
    elif agg == 'sum':
        acc = prob_o + prob_t
        acc_o = acc_t = jnp.zeros_like(acc)
    elif agg == 'window':
        acc_o, acc_t = search_window(prob_o, prob_t, cfg['window_size'],
                                     cfg['weighted_window'])
        acc = jnp.zeros_like(acc_o)
    else:
        raise ValueError(f'unknown aggregation: {agg}')

    def body(carry, inputs):
        acc, acc_o, acc_t, count = carry
        Hmats, vmasks = inputs               # (wb, 3, 3), (wb, H, W)
        # ONE shared-index multi-warp applies every homography to both
        # spectra at once (index maps shared over batch AND channel —
        # ~3x fewer gather cycles than wb*B independent warps).
        stacked = jnp.concatenate([img_o, img_t], axis=-1)   # (B,H,W,2)
        w = _warp_multi(stacked, Hmats, "bilinear", "reflection")
        w = w.reshape((wb * B,) + w.shape[2:])               # (wb*B,H,W,2)
        po = maybe_smooth(prob_fn(w[..., :1], True))         # (wb*B,H,W)
        pt = maybe_smooth(prob_fn(w[..., 1:], False))
        po = po.reshape((wb, B) + po.shape[1:])
        pt = pt.reshape((wb, B) + pt.shape[1:])

        Hinv = jnp.linalg.inv(Hmats)                         # (wb, 3, 3)
        # the valid masks don't vary over B: unwarp once per homography
        count_sample = _warp_batch(
            vmasks[..., None], Hinv, "nearest", "zeros")[..., 0]
        count_sample = count_sample[:, None]                 # (wb,1,H,W)

        def unwarp(p):                                       # (wb,B',H,W)
            # B rides the channel axis so the inverse-warp gather's
            # index maps are shared across the batch
            u = _warp_batch(p.transpose(0, 2, 3, 1), Hinv,
                            "bilinear", "zeros")
            return u.transpose(0, 3, 1, 2)

        if agg == 'window':
            u = unwarp(jnp.concatenate([po, pt], axis=1))    # (wb,2B,H,W)
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            fo, ft = search_window(flat(u[:, :B]), flat(u[:, B:]),
                                   cfg['window_size'],
                                   cfg['weighted_window'])
            fo = fo.reshape((wb, B) + fo.shape[1:])
            ft = ft.reshape((wb, B) + ft.shape[1:])
            acc_o = acc_o + (fo * count_sample).sum(0)
            acc_t = acc_t + (ft * count_sample).sum(0)
        else:
            pw = po * pt if agg == 'prod' else po + pt       # (wb,B,H,W)
            acc = acc + (unwarp(pw) * count_sample).sum(0)
        count = count + count_sample.sum(0)
        return (acc, acc_o, acc_t, count), None

    (acc, acc_o, acc_t, count), _ = jax.lax.scan(
        body, (acc, acc_o, acc_t, count), (homographies, valid_masks))

    if agg == 'window':
        out_o = acc_o / count
        out_t = acc_t / count
        if cfg['min_count'] > 0:
            keep = count >= cfg['min_count']
            out_o = jnp.where(keep, out_o, 0.0)
            out_t = jnp.where(keep, out_t, 0.0)
        return {'prob': None, 'prob_optical': out_o, 'prob_thermal': out_t}

    out = acc / count
    if agg == 'prod':
        out = jnp.sqrt(out)
    elif agg == 'sum':
        out = out * 0.5
    if cfg['min_count'] > 0:
        out = jnp.where(count >= cfg['min_count'], out, 0.0)
    return {'prob': out, 'prob_optical': None, 'prob_thermal': None}


def make_sharded_ha_fn(make_prob_fn, config, mesh, warp_batch=8):
    """Mesh-sharded HA program for multi-chip pseudo-GT export — the
    TPU-native analog of the reference's DataParallel-wrapped warper
    (homographies.py:95-98, export_keypoints.py:151-154): the sample batch
    is sharded over the mesh's 'data' axis and each chip runs the full
    warp->forward->unwarp->aggregate program on its shard (embarrassingly
    parallel — no collectives). Per-sample outputs are bit-identical to
    the single-chip path because every per-sample computation is
    independent (eval-mode forward, per-sample warps/aggregation).

    Args:
        make_prob_fn: variables -> prob_fn(img, is_optical) (variables must
            be an explicit argument so shard_map can mark them replicated
            rather than baking 80 MB of closure constants into the program).
        mesh: jax.sharding.Mesh with a 'data' axis; the batch must be a
            multiple of its size.

    Returns (run(variables, img_o, img_t, homographies) -> dict, merged_cfg).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    cfg = dict_update(copy.deepcopy(HA_DEFAULT_CONFIG), config or {})

    def local(variables, img_o, img_t, homographies):
        return _ha_run_impl(make_prob_fn(variables), cfg, warp_batch,
                            img_o, img_t, homographies, None)

    # check_vma=False: the per-shard body treats replicated inputs
    # (variables, homographies) as unsharded constants, same as the
    # serving pipeline's shard_map usage
    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
                        out_specs=P(DATA_AXIS), check_vma=False)
    return jax.jit(sharded), cfg


def homographic_adaptation_multispectral(img_o, img_t, prob_fn, config=None,
                                         rng=None):
    """Convenience wrapper: sample homographies on host, run the jitted HA
    program (reference homographic_adaptation_multispectral)."""
    run, cfg = make_ha_fn(prob_fn, config)
    Hs, _ = sample_ha_homographies(cfg, img_o.shape[1:3], rng,
                                   with_masks=False)
    return run(img_o, img_t, jnp.asarray(Hs))


def homographic_adaptation(img, prob_fn, config=None, rng=None):
    """Single-spectrum variant (homographies.py:232-300): count-weighted
    average of unwarped probabilities."""
    cfg = dict_update(copy.deepcopy(HA_DEFAULT_CONFIG), config or {})
    fs = cfg['filter_size']

    def maybe_smooth(p):
        return _smooth(p, fs) if fs > 0 else p

    Hs, _ = sample_ha_homographies(cfg, img.shape[1:3], rng, with_masks=False)
    Hs = jnp.asarray(Hs)

    @jax.jit
    def run(img, Hs):
        masks = compute_valid_mask_device(
            Hs, img.shape[1:3], cfg['erosion_radius'], cfg['mask_border'])
        prob = maybe_smooth(prob_fn(img, True))
        count = jnp.ones_like(prob)

        def body(carry, inputs):
            prob, count = carry
            Hmat, vmask = inputs
            # shared-index warps: one gather covers the whole batch
            w = _warp_multi(img, Hmat[None], "bilinear", "reflection")[0]
            p = maybe_smooth(prob_fn(w, True))
            Hinv = jnp.linalg.inv(Hmat)
            count_sample = _warp_batch(
                vmask[None, :, :, None], Hinv[None],
                "nearest", "zeros")[0, ..., 0]                    # (H, W)
            unwarped = _warp_multi(p[..., None], Hinv[None],
                                   "bilinear", "zeros")[0, ..., 0]
            return (prob + unwarped * count_sample, count + count_sample), None

        (prob, count), _ = jax.lax.scan(body, (prob, count), (Hs, masks))
        out = prob / count
        if cfg['min_count'] > 0:
            out = jnp.where(count >= cfg['min_count'], out, 0.0)
        return out

    return run(img, Hs)

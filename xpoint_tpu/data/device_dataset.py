"""Device-resident training data: the whole corpus in HBM.

The reference streams every batch host->device after cv2 augmentation in
CPU workers (train.py + ImagePairDataset); at one host core that costs
~100 ms/sample/epoch and the accelerator idles. For corpora that fit in
HBM (the 128-pair mini corpus is ~0.3 GB; a v5e chip has 16 GB) the
TPU-native design keeps the RAW samples resident on device and performs
batch assembly — index gather, random crop, random-pairs spectrum swap,
homographic augmentation, keypoint-map generation, hm-input prep — inside
the jitted train step (`data/device_augment.py`). The host then only
dispatches steps: epochs run at device speed and pipeline freely.

Opt-in via `training: device_data: true`. Semantics match the host path
per-op (same warp/mask/truncation math, same reference quirks: keypoints
NOT swapped by random_pairs, image_pair.py:224-233; hm-input quirks per
prep_hm_regression_input); the random streams are jax.random instead of
python/numpy, so individual draws differ at equal seeds.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .device_augment import make_pair_augment, keypoint_map_from_coords


def load_resident_pair_data(dataset, max_kp=None):
    """Stack an ImagePairDataset's raw samples into device arrays.

    Returns (data, meta): data is a pytree of jnp arrays
        optical/thermal: (N, H0, W0) float32
        kp_coords_{o,t}: (N, K, 2) float32   (row, col)
        kp_valid_{o,t}:  (N, K) bool
    and meta carries (N, H0, W0, K).
    """
    n = len(dataset)
    opticals, thermals, kps_o, kps_t = [], [], [], []
    for i in range(n):
        optical, thermal = dataset._load_images(i)
        kp = dataset._load_keypoints(i)
        pair = kp if isinstance(kp, list) else [kp, kp]
        opticals.append(np.asarray(optical, np.float32))
        thermals.append(np.asarray(thermal, np.float32))
        kps_o.append(None if pair[0] is None
                     else np.asarray(pair[0], np.float32).reshape(-1, 2))
        kps_t.append(None if pair[1] is None
                     else np.asarray(pair[1], np.float32).reshape(-1, 2))

    H0, W0 = opticals[0].shape[:2]
    if any(o.shape[:2] != (H0, W0) for o in opticals + thermals):
        raise ValueError("device_data requires equally-sized samples")

    have_kp = kps_o[0] is not None
    if have_kp:
        K = max(max(len(k) for k in kps_o), max(len(k) for k in kps_t), 1)
        if max_kp:
            K = min(K, max_kp)

        def pad(kp_list):
            coords = np.zeros((n, K, 2), np.float32)
            valid = np.zeros((n, K), bool)
            for i, k in enumerate(kp_list):
                m = min(len(k), K)
                coords[i, :m] = k[:m]
                valid[i, :m] = True
            return coords, valid

        co, vo = pad(kps_o)
        ct, vt = pad(kps_t)

    data = {'optical': jnp.asarray(np.stack(opticals)),
            'thermal': jnp.asarray(np.stack(thermals))}
    if have_kp:
        data.update(kp_coords_o=jnp.asarray(co), kp_valid_o=jnp.asarray(vo),
                    kp_coords_t=jnp.asarray(ct), kp_valid_t=jnp.asarray(vt))
    return data, {'n': n, 'shape': (H0, W0), 'k': (K if have_kp else 0)}


def make_resident_batch_fn(dataset_cfg, meta, hm_input=False,
                           mesh=None):
    """Build batch_fn(rng, {'data', 'idx'}) -> standard pair batch, for
    make_train_step(batch_fn=...). Everything runs inside the caller's jit.
    """
    H0, W0 = meta['shape']
    h = (dataset_cfg['height'] // 32 * 32 if dataset_cfg['height'] > 0
         else H0)
    w = (dataset_cfg['width'] // 32 * 32 if dataset_cfg['width'] > 0 else W0)
    if h > H0 or w > W0:
        raise ValueError("requested crop exceeds image size")
    random_pairs = bool(dataset_cfg.get('random_pairs'))
    aug = dataset_cfg['augmentation']
    if aug['photometric'].get('enable'):
        raise NotImplementedError(
            "device_data supports homographic augmentation on device; "
            "photometric augmentation still runs host-side — disable it "
            "or use the host data path")
    hom = aug['homographic']
    augment = (make_pair_augment(
        (h, w), dict(hom.get('params') or {}),
        border_reflect=bool(hom.get('border_reflect', True)),
        valid_border_margin=int(hom.get('valid_border_margin', 0) or 0),
        mask_border=bool(hom.get('mask_border', True)),
        hm_input=hm_input) if hom.get('enable') else None)

    shard = None
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P(DATA_AXIS))

        def shard(x):
            return jax.lax.with_sharding_constraint(x, sharding)

    def crop_one(img, r, c):
        return jax.lax.dynamic_slice(img, (r, c), (h, w))

    def batch_fn(rng, payload):
        data, idx = payload['data'], payload['idx']
        B = idx.shape[0]
        r_crop, r_sw1, r_sw2, r_aug = jax.random.split(rng, 4)

        opt = jnp.take(data['optical'], idx, axis=0)       # (B, H0, W0)
        th = jnp.take(data['thermal'], idx, axis=0)
        if shard is not None:
            opt, th = shard(opt), shard(th)

        # random crop (host _crop, image_pair.py:143-173)
        ih = jax.random.randint(r_crop, (B,), 0, H0 - h + 1)
        iw = jax.random.randint(jax.random.fold_in(r_crop, 1), (B,), 0,
                                W0 - w + 1)
        opt = jax.vmap(crop_one)(opt, ih, iw)
        th = jax.vmap(crop_one)(th, ih, iw)

        sides = {'optical': {}, 'thermal': {}}
        if meta['k']:
            shift = jnp.stack([ih, iw], axis=1)[:, None, :].astype(jnp.float32)
            for key_side, c_key, v_key in (('optical', 'kp_coords_o',
                                            'kp_valid_o'),
                                           ('thermal', 'kp_coords_t',
                                            'kp_valid_t')):
                kc = jnp.take(data[c_key], idx, axis=0) - shift
                kv = jnp.take(data[v_key], idx, axis=0)
                kv = kv & (kc[..., 0] >= 0) & (kc[..., 0] < h) \
                     & (kc[..., 1] >= 0) & (kc[..., 1] < w)
                sides[key_side]['keypoint_coords'] = kc
                sides[key_side]['keypoint_valid'] = kv

        # random_pairs spectrum shuffling (image_pair.py:224-233):
        # independent coin flips PER SIDE; keypoints deliberately NOT
        # swapped (host-path parity — reference quirk)
        opt_is_optical = jnp.ones((B,), bool)
        th_is_optical = jnp.zeros((B,), bool)
        if random_pairs:
            b1 = jax.random.bernoulli(r_sw1, 0.5, (B,))
            b2 = jax.random.bernoulli(r_sw2, 0.5, (B,))
            new_opt = jnp.where(b1[:, None, None], th, opt)
            new_th = jnp.where(b2[:, None, None], opt, th)
            opt, th = new_opt, new_th
            opt_is_optical = ~b1
            th_is_optical = b2

        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        ones = jnp.ones((B, h, w), jnp.float32)
        batch = {
            'optical': {'image': opt[..., None], 'valid_mask': ones,
                        'homography': eye,
                        'is_optical': opt_is_optical[:, None],
                        **sides['optical']},
            'thermal': {'image': th[..., None], 'valid_mask': ones,
                        'homography': eye,
                        'is_optical': th_is_optical[:, None],
                        **sides['thermal']},
        }
        if augment is not None:
            batch = augment(r_aug, batch)
        # any keypoint coords not consumed by augmentation -> maps
        for side in ('optical', 'thermal'):
            if 'keypoint_coords' in batch[side]:
                batch[side]['keypoints'] = jax.vmap(
                    partial(keypoint_map_from_coords, image_shape=(h, w)))(
                        batch[side].pop('keypoint_coords'),
                        batch[side].pop('keypoint_valid'))
        if shard is not None:
            batch = jax.tree.map(shard, batch)
        return batch

    return batch_fn

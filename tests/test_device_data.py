"""Device-resident data path: on-device homography sampling, augmentation
and batch assembly (data/device_augment.py, data/device_dataset.py) vs the
host reference pipeline."""
import numpy as np
import h5py
import jax
import jax.numpy as jnp

from xpoint_tpu.data.device_augment import (
    sample_homography_device, warp_keypoint_map, prep_hm_input_device,
    make_pair_augment)
from xpoint_tpu.geometry.homography import (
    sample_homography, warp_keypoints, filter_points, compute_valid_mask)
from xpoint_tpu.utils.keypoints import generate_keypoint_map


def test_sample_homography_device_disabled_matches_host():
    """With every transform disabled both samplers are deterministic (the
    centered patch_ratio square) and must agree exactly."""
    cfg = dict(perspective=False, scaling=False, rotation=False,
               translation=False, patch_ratio=0.8)
    h_host = sample_homography((64, 96), rng=np.random.default_rng(0), **cfg)
    h_dev = np.asarray(sample_homography_device(
        jax.random.PRNGKey(0), (64, 96), **cfg))
    np.testing.assert_allclose(h_dev, h_host, atol=1e-4)


def test_sample_homography_device_distribution():
    """Full transform set: valid invertible homographies whose warped-corner
    spread matches the host sampler's to loose statistical tolerance."""
    params = dict(perspective=True, scaling=True, rotation=True,
                  translation=True, scaling_amplitude=0.2,
                  perspective_amplitude_x=0.1, perspective_amplitude_y=0.1,
                  patch_ratio=0.85, max_angle=1.57, allow_artifacts=True,
                  translation_overflow=0.05)
    n = 200
    shape = (64, 64)
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    hs_dev = np.asarray(jax.jit(jax.vmap(
        lambda k: sample_homography_device(k, shape, **params)))(keys))
    rng = np.random.default_rng(7)
    hs_host = np.stack([sample_homography(shape, rng=rng, **params)
                        for _ in range(n)])

    corners = np.array([[0, 0, 1], [63, 0, 1], [63, 63, 1], [0, 63, 1]],
                       np.float64).T

    def corner_cloud(hs):
        p = hs @ corners                       # (n, 3, 4)
        return (p[:, :2] / p[:, 2:3]).reshape(len(hs), -1)

    cd, ch = corner_cloud(hs_dev.astype(np.float64)), corner_cloud(hs_host)
    assert np.all(np.isfinite(cd))
    dets = np.linalg.det(hs_dev)
    assert np.all(np.abs(dets) > 1e-6)
    # mean/std of each warped-corner coordinate within loose bounds
    np.testing.assert_allclose(cd.mean(0), ch.mean(0), atol=6.0)
    np.testing.assert_allclose(cd.std(0), ch.std(0), rtol=0.35, atol=4.0)


def test_sample_homography_device_no_artifacts_stays_in_bounds():
    params = dict(perspective=True, scaling=True, rotation=True,
                  translation=True, allow_artifacts=False,
                  scaling_amplitude=0.15, perspective_amplitude_x=0.05,
                  perspective_amplitude_y=0.05, patch_ratio=0.7,
                  max_angle=0.8)
    shape = (64, 64)
    keys = jax.random.split(jax.random.PRNGKey(3), 64)
    hs = np.asarray(jax.jit(jax.vmap(
        lambda k: sample_homography_device(k, shape, **params)))(keys))
    # unit-square corners must land inside the image for every draw:
    # each transform either keeps the patch in [0,1]^2 or falls back
    corners = np.array([[0, 0, 1], [63, 0, 1], [63, 63, 1], [0, 63, 1]],
                       np.float64).T
    p = hs.astype(np.float64) @ corners
    xy = p[:, :2] / p[:, 2:3]
    assert xy.min() >= -1.0 and xy.max() <= 64.0


def test_warp_keypoint_map_matches_host_chain():
    rng = np.random.default_rng(1)
    H_img, W_img = 48, 64
    kp = np.stack([rng.integers(0, H_img, 40),
                   rng.integers(0, W_img, 40)], axis=1).astype(np.float64)
    hom = sample_homography((H_img, W_img), rng=rng)

    wp = warp_keypoints(kp, hom)
    wp = filter_points(wp, (H_img, W_img))
    want64 = generate_keypoint_map(wp, (H_img, W_img))

    # float32 oracle of the same chain (the device path runs fp32 — TPU has
    # no f64 — so a keypoint landing exactly on a pixel boundary may
    # truncate differently than cv2's f64; bound that drift separately)
    xy = kp[:, ::-1].astype(np.float32)
    p = np.concatenate([xy, np.ones((len(xy), 1), np.float32)], 1) \
        @ hom.astype(np.float32).T
    rc = (p[:, :2] / p[:, 2:3])[:, ::-1]
    rci = rc.astype(np.int32)
    inb = ((rc[:, 0] >= 0) & (rc[:, 1] >= 0)
           & (rc[:, 0] < H_img) & (rc[:, 1] < W_img))
    want32 = np.zeros((H_img, W_img), bool)
    want32[rci[inb, 0], rci[inb, 1]] = True

    K = 64                                     # padded capacity
    coords = np.zeros((K, 2), np.float32)
    valid = np.zeros((K,), bool)
    coords[:len(kp)] = kp
    valid[:len(kp)] = True
    got = np.asarray(warp_keypoint_map(
        jnp.asarray(coords), jnp.asarray(valid),
        jnp.asarray(hom, jnp.float32), (H_img, W_img))).astype(bool)
    np.testing.assert_array_equal(got, want32)
    assert np.count_nonzero(got != want64) <= 2   # fp32-vs-fp64 boundary


def test_prep_hm_input_device_matches_host():
    from xpoint_tpu.data.image_pair import ImagePairDataset
    rng = np.random.default_rng(2)
    H_img = W_img = 160
    opt = rng.uniform(size=(H_img, W_img)).astype(np.float32)
    th = rng.uniform(size=(H_img, W_img)).astype(np.float32)
    h_o = sample_homography((H_img, W_img), rng=rng).astype(np.float32)
    h_t = np.eye(3, dtype=np.float32)
    tl = [H_img // 2 - 64, W_img // 2 - 64]

    want_hm, want_four = ImagePairDataset.prep_hm_regression_input(
        opt, th, h_o, h_t, top_left_point=tl, patch_size_h_w=[128, 128])
    got_hm, got_four = prep_hm_input_device(
        jnp.asarray(opt)[..., None], jnp.asarray(th)[..., None],
        jnp.asarray(h_o), jnp.asarray(h_t),
        top_left=(tl[0], tl[1]), patch_size=(128, 128))
    np.testing.assert_allclose(np.asarray(got_hm), want_hm, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_four), want_four, atol=1e-6)


def test_pair_augment_semantics():
    """One side warped per sample; the other identity with a dummy all-ones
    mask; the warped side's mask equals the host compute_valid_mask for the
    homography the augmenter reports."""
    B, H_img, W_img = 4, 64, 64
    rng = np.random.default_rng(5)
    batch = {
        'optical': {'image': jnp.asarray(
            rng.uniform(size=(B, H_img, W_img, 1)).astype(np.float32))},
        'thermal': {'image': jnp.asarray(
            rng.uniform(size=(B, H_img, W_img, 1)).astype(np.float32))},
    }
    aug = make_pair_augment((H_img, W_img),
                            dict(patch_ratio=0.85, max_angle=1.0),
                            border_reflect=True, valid_border_margin=2,
                            mask_border=True)
    out = jax.jit(aug)(jax.random.PRNGKey(0), batch)
    ho = np.asarray(out['optical']['homography'])
    ht = np.asarray(out['thermal']['homography'])
    mo = np.asarray(out['optical']['valid_mask'])
    mt = np.asarray(out['thermal']['valid_mask'])
    eye = np.eye(3, dtype=np.float32)
    for i in range(B):
        o_id = np.allclose(ho[i], eye)
        t_id = np.allclose(ht[i], eye)
        assert o_id != t_id, "exactly one side must be warped"
        # identity side: dummy ones mask (host image_pair.py:238,242)
        id_mask = mo[i] if o_id else mt[i]
        np.testing.assert_array_equal(id_mask, np.ones((H_img, W_img)))
        # warped side: host compute_valid_mask on the SAME homography
        h_w = ht[i] if o_id else ho[i]
        w_mask = mt[i] if o_id else mo[i]
        want = compute_valid_mask((H_img, W_img), h_w.astype(np.float64),
                                  erosion_radius=4, mask_border=True)
        np.testing.assert_array_equal(w_mask, want)


def _pair_h5_with_labels(tmp_path, n=4, size=96, n_kp=12):
    rng = np.random.default_rng(0)
    dpath = str(tmp_path / "pairs.hdf5")
    lpath = str(tmp_path / "labels.hdf5")
    with h5py.File(dpath, 'w') as f, h5py.File(lpath, 'w') as lf:
        for i in range(n):
            g = f.create_group(f"sample_{i}")
            g.create_dataset('optical', data=rng.uniform(size=(size, size)))
            g.create_dataset('thermal', data=rng.uniform(size=(size, size)))
            kp = np.stack([rng.integers(0, size, n_kp),
                           rng.integers(0, size, n_kp)], 1)
            lf.create_group(f"sample_{i}").create_dataset('keypoints',
                                                          data=kp)
    return dpath, lpath


def test_resident_batch_fn_no_aug_matches_raw(tmp_path):
    from xpoint_tpu.data.image_pair import ImagePairDataset
    from xpoint_tpu.data.device_dataset import (load_resident_pair_data,
                                                make_resident_batch_fn)
    dpath, lpath = _pair_h5_with_labels(tmp_path, n=4, size=96)
    cfg = {'filename': dpath, 'keypoints_filename': lpath,
           'height': 96, 'width': 96, 'single_image': False,
           'augmentation': {'photometric': {'enable': False},
                            'homographic': {'enable': False}}}
    ds = ImagePairDataset(cfg)
    data, meta = load_resident_pair_data(ds)
    assert meta['n'] == 4 and meta['shape'] == (96, 96)
    batch_fn = make_resident_batch_fn(ds.config, meta)
    idx = jnp.asarray([2, 0])
    out = jax.jit(batch_fn)(jax.random.PRNGKey(0),
                            {'data': data, 'idx': idx})
    # full-size crop is deterministic: images equal the raw samples
    raw_o, _ = ds._load_images(2)
    np.testing.assert_allclose(
        np.asarray(out['optical']['image'][0, ..., 0]), raw_o, atol=1e-6)
    # keypoint maps equal the host generate_keypoint_map of the raw labels
    kp = ds._load_keypoints(0)
    want = generate_keypoint_map(kp, (96, 96))
    np.testing.assert_array_equal(
        np.asarray(out['thermal']['keypoints'][1]).astype(bool), want)
    assert out['optical']['valid_mask'].shape == (2, 96, 96)
    np.testing.assert_allclose(np.asarray(out['optical']['homography'][0]),
                               np.eye(3), atol=0)


def test_resident_train_step_runs(tmp_path):
    """End-to-end: resident data + on-device augmentation inside the jitted
    train step produces finite losses and updates parameters."""
    import optax
    from xpoint_tpu.data.image_pair import ImagePairDataset
    from xpoint_tpu.data.device_dataset import (load_resident_pair_data,
                                                make_resident_batch_fn)
    from xpoint_tpu.models import build_xpoint
    from xpoint_tpu.losses import XPointLoss
    from xpoint_tpu.parallel.train_step import make_train_step, TrainState

    dpath, lpath = _pair_h5_with_labels(tmp_path, n=4, size=96)
    cfg = {'filename': dpath, 'keypoints_filename': lpath,
           'height': 64, 'width': 64, 'single_image': False,
           'random_pairs': True,
           'augmentation': {'photometric': {'enable': False},
                            'homographic': {
                                'enable': True, 'border_reflect': True,
                                'params': {'patch_ratio': 0.85},
                                'valid_border_margin': 2,
                                'mask_border': True}}}
    ds = ImagePairDataset(cfg)
    data, meta = load_resident_pair_data(ds)
    batch_fn = make_resident_batch_fn(ds.config, meta)

    module, _ = build_xpoint({"multispectral": True,
                              "descriptor_head": False,
                              "homography_regression_head": {"check": False}})
    img = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    loss_fn = XPointLoss({"detector_loss_function": "cross_entropy",
                          "detector_handle_multiple_keypoints":
                              "soft_assignment",
                          "descriptor_loss": False})
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"), optax.adam(1e-3))
    step = make_train_step(module, loss_fn, takes_pair=True, donate=False,
                           batch_fn=batch_fn)
    p0 = jax.tree.leaves(state.params)[0].copy()
    for s in range(2):
        state, comps = step(state, {'data': data,
                                    'idx': jnp.asarray([s, (s + 1) % 4])},
                            jax.random.PRNGKey(s))
        assert np.isfinite(float(comps['loss']))
        assert float(comps['skipped_nonfinite']) == 0.0
    assert not np.allclose(p0, jax.tree.leaves(state.params)[0])

    # GradScaler parity (reference train.py:238-244): a non-finite batch
    # must be SKIPPED — params, opt state and step counter unchanged — and
    # flagged, not poison the run
    bad = dict(data)
    bad['optical'] = data['optical'].at[0].set(jnp.nan)
    before = jax.device_get((state.params, state.step))
    state, comps = step(state, {'data': bad, 'idx': jnp.asarray([0, 1])},
                        jax.random.PRNGKey(9))
    assert not np.isfinite(float(comps['loss']))
    assert float(comps['skipped_nonfinite']) == 1.0
    after = jax.device_get((state.params, state.step))
    assert int(after[1]) == int(before[1])
    for a, b in zip(jax.tree.leaves(before[0]), jax.tree.leaves(after[0])):
        np.testing.assert_array_equal(a, b)

    # and a clean batch afterwards still trains
    state, comps = step(state, {'data': data, 'idx': jnp.asarray([2, 3])},
                        jax.random.PRNGKey(10))
    assert np.isfinite(float(comps['loss']))


def test_resident_batch_fn_hm_input_small_images(tmp_path):
    """hm_input prep with images smaller than the host default 128^2 patch
    (image_pair.py:286): the device path clamps the patch to the image
    instead of failing the dynamic_slice bounds check."""
    from xpoint_tpu.data.image_pair import ImagePairDataset
    from xpoint_tpu.data.device_dataset import (load_resident_pair_data,
                                                make_resident_batch_fn)

    dpath, lpath = _pair_h5_with_labels(tmp_path, n=4, size=96)
    cfg = {'filename': dpath, 'keypoints_filename': lpath,
           'height': 64, 'width': 64, 'single_image': False,
           'augmentation': {'photometric': {'enable': False},
                            'homographic': {
                                'enable': True, 'border_reflect': True,
                                'params': {'patch_ratio': 0.85},
                                'valid_border_margin': 2,
                                'mask_border': True}}}
    ds = ImagePairDataset(cfg)
    data, meta = load_resident_pair_data(ds)
    batch_fn = make_resident_batch_fn(ds.config, meta, hm_input=True)
    out = jax.jit(batch_fn)(jax.random.PRNGKey(0),
                            {'data': data, 'idx': jnp.asarray([0, 1])})
    assert out['hm_input'].shape == (2, 64, 64, 2)
    assert out['hfour_points'].shape == (2, 4, 2)
    assert np.isfinite(np.asarray(out['hfour_points'])).all()


def test_resident_batch_fn_mesh_sharded_matches_unsharded(tmp_path):
    """The mesh-constrained assembly (with_sharding_constraint over the
    batch axis) must be numerically identical to the unsharded path."""
    from xpoint_tpu.data.image_pair import ImagePairDataset
    from xpoint_tpu.data.device_dataset import (load_resident_pair_data,
                                                make_resident_batch_fn)
    from xpoint_tpu.parallel import make_mesh

    dpath, lpath = _pair_h5_with_labels(tmp_path, n=8, size=96)
    cfg = {'filename': dpath, 'keypoints_filename': lpath,
           'height': 64, 'width': 64, 'single_image': False,
           'augmentation': {'photometric': {'enable': False},
                            'homographic': {
                                'enable': True, 'border_reflect': True,
                                'params': {'patch_ratio': 0.85},
                                'valid_border_margin': 2,
                                'mask_border': True}}}
    ds = ImagePairDataset(cfg)
    data, meta = load_resident_pair_data(ds)
    mesh = make_mesh(8)
    fn_plain = jax.jit(make_resident_batch_fn(ds.config, meta))
    fn_mesh = jax.jit(make_resident_batch_fn(ds.config, meta, mesh=mesh))
    idx = jnp.arange(8)
    rng = jax.random.PRNGKey(1)
    out_plain = fn_plain(rng, {'data': data, 'idx': idx})
    with mesh:
        out_mesh = fn_mesh(rng, {'data': data, 'idx': idx})
    for side in ('optical', 'thermal'):
        for k in ('image', 'valid_mask', 'keypoints', 'homography'):
            np.testing.assert_allclose(np.asarray(out_mesh[side][k]),
                                       np.asarray(out_plain[side][k]),
                                       atol=1e-6, err_msg=f"{side}/{k}")

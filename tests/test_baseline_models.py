"""Baseline model families: SuperPointMagicLeap (converted-weight parity),
ClassicDetectors (SIFT/LGHD), RIFT2 (vs the reference implementation)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def make_structured_image(size=200, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size), np.float32)
    for _ in range(20):
        x, y = rng.integers(10, size - 50, 2)
        w, h = rng.integers(10, 40, 2)
        cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)),
                      float(rng.uniform(0.3, 1.0)), -1)
    return cv2.GaussianBlur(img, (5, 5), 0)


def test_superpoint_conversion_parity():
    from reference_oracle import get_reference
    get_reference()   # installs stubs + sys.path
    from xpoint.models.SuperPointMagicLeap import SuperPointMagicLeap as Ref

    from xpoint_tpu.models.superpoint import (SuperPointMagicLeap,
                                              convert_magicleap_weights)
    ref = Ref()
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_magicleap_weights(sd)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref({'image': torch.from_numpy(img)})

    module = SuperPointMagicLeap()
    out = module.apply(jax.tree.map(jnp.asarray, variables),
                       jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out['logits']).transpose(0, 3, 1, 2),
        out_ref['logits'].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out['desc']).transpose(0, 3, 1, 2),
        out_ref['desc'].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['prob']),
                               out_ref['prob'][:, 0].numpy(), atol=1e-4)


def test_classic_detectors_sift():
    from xpoint_tpu.models.classic import ClassicDetectors
    det = ClassicDetectors({'method': 'SIFT', 'min_keypoints': 10})
    img = make_structured_image()
    out = det({'image': img[None, ..., None]})
    n_kp = int((out['prob'] > 0).sum())
    assert n_kp > 10
    assert out['desc'].shape[-1] == 128        # SIFT dims
    # descriptors planted exactly at keypoint pixels
    ys, xs = np.nonzero(out['prob'][0])
    assert np.abs(out['desc'][0, ys[0], xs[0]]).sum() > 0


def test_lghd_descriptor():
    from xpoint_tpu.models.classic import LGHD
    img = (make_structured_image(128) * 255).astype(np.uint8)
    lghd = LGHD(128, 128)
    kps, descs = lghd.detectAndCompute(img)
    assert len(kps) > 0
    assert descs.shape == (len(kps), 16 * 4 * 6)


def test_phasecong_matches_reference():
    """Moment map parity vs the reference Kovesi port."""
    from reference_oracle import get_reference
    get_reference()
    from xpoint.models.RIFT2.src.phase_congruency.phasecong import (
        phasecong as ref_phasecong)
    from xpoint_tpu.models.rift2 import phasecong

    img = (make_structured_image(96) * 255).astype(np.uint8)
    M_ref = ref_phasecong(img, nscale=4, norient=6, minWaveLength=3,
                          mult=1.6, sigmaOnf=0.75, g=3, k=1)[0]
    M = phasecong(img, nscale=4, norient=6, minWaveLength=3,
                  mult=1.6, sigmaOnf=0.75, g=3, k=1)[0]
    # same structure: high correlation of the moment maps
    c = np.corrcoef(np.asarray(M_ref).ravel(), M.ravel())[0, 1]
    assert c > 0.98, c


def test_rift2_detect_and_match_self():
    """RIFT2 end-to-end: keypoints + 216-d descriptors; matching an image
    to itself recovers identity-dominant matches."""
    from xpoint_tpu.models.rift2 import RIFT2
    img = (make_structured_image(128) * 255).astype(np.uint8)
    rift = RIFT2(npt=200)
    kp, des = rift.detectAndCompute(img)
    assert len(kp) > 20
    assert des.shape == (len(kp), 216)
    norms = np.linalg.norm(des, axis=1)
    assert (np.abs(norms[norms > 0] - 1.0) < 1e-5).all()

    # self-match: nearest neighbor of each descriptor should be itself-ish
    d = des @ des.T
    nn = np.argmax(d, axis=1)
    frac_self = (nn == np.arange(len(kp))).mean()
    assert frac_self > 0.5, frac_self


def test_classic_detectors_rift2_interface():
    from xpoint_tpu.models.classic import ClassicDetectors
    det = ClassicDetectors({'method': 'RIFT2', 'min_keypoints': 5})
    # patchsize 96 keypoints need room: image must exceed ~2x the patch
    img = make_structured_image(200)
    out = det({'image': img[None, ..., None]})
    assert (out['prob'] > 0).sum() > 5
    assert out['desc'].shape[-1] == 216

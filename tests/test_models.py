"""Model construction + forward-shape tests (reference smoke tests:
XPoint.py:475-494, VMamba.py __main__)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xpoint_tpu.models import build_xpoint
from xpoint_tpu.models.vssm import VSSM
from xpoint_tpu.models.regnet import RegNet


VMAMBA_MODEL_CFG = {
    "type": "XPoint",
    "multispectral": False,
    "takes_pair": True,
    "descriptor_size": 256,
    "homography_regression_head": {"check": True, "type": "RegNet"},
    "use_attention": {
        "check": True, "type": "VMamba", "height": 256, "width": 256,
        "model_parameters": {
            "DATA": {"IMG_SIZE": 512},
            "MODEL": {
                "DROP_PATH_RATE": 0.2,
                "VSSM": {
                    "DEPTHS": [2, 2, 2, 2], "EMBED_DIM": 96,
                    "MLP_RATIO": 4.0, "PATCHEMBED": "v2", "DOWNSAMPLE": "v3",
                    "SSM_CONV": 3, "SSM_CONV_BIAS": False,
                    "SSM_DT_RANK": "auto", "SSM_D_STATE": 1,
                    "SSM_FORWARDTYPE": "v05_noz", "SSM_RATIO": 1.0,
                },
            },
        },
        "pretrained": {"check": True},
    },
}


def test_vssm_output_shape():
    # jit both phases: unjitted flax apply executes eagerly op-by-op on the
    # 1-core CPU runner; jitted programs hit the suite's persistent
    # compilation cache (conftest.py) on every rerun
    model = VSSM(depths=(1, 1, 1, 1), embed_dim=32)
    x = jnp.zeros((1, 64, 64, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 8, 8, 16)     # H/8, W/8, embed/2


def test_cnn_xpoint_forward_shapes():
    module, cfg = build_xpoint({"multispectral": True,
                                "homography_regression_head": {"check": False}})
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 96, 1)),
                      dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)
    out = module.apply(variables, img, "optical")
    assert out["logits"].shape == (2, 8, 12, 65)
    assert out["desc"].shape == (2, 8, 12, 256)
    assert out["encoder_output"].shape == (2, 8, 12, 128)
    # descriptors unit-norm
    n = jnp.linalg.norm(out["desc"], axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)


def test_mixed_spectrum_routing_selects_per_sample():
    module, _ = build_xpoint({"multispectral": True,
                              "homography_regression_head": {"check": False}})
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 32, 1)),
                      dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), img,
                            method=module.init_all)

    out_o = module.apply(variables, img, "optical")
    out_t = module.apply(variables, img, "thermal")
    is_opt = jnp.array([True, False])
    out_m = module.apply(variables, img, "mixed", is_opt)
    np.testing.assert_allclose(np.asarray(out_m["logits"][0]),
                               np.asarray(out_o["logits"][0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m["logits"][1]),
                               np.asarray(out_t["logits"][1]), atol=1e-5)


def test_vmamba_xpoint_pair_forward():
    module, cfg = build_xpoint(VMAMBA_MODEL_CFG)
    assert module.encoder_type == "vmamba"
    assert module.n_channels[4] == 48
    img = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(lambda r: module.init(
        r, img, method=module.init_all))(jax.random.PRNGKey(0))
    pred_o, pred_t, pred_hm = jax.jit(lambda v, a, b: module.apply(
        v, a, b, method=module.forward_pair))(variables, img, img)
    assert pred_o["logits"].shape == (1, 8, 8, 65)
    assert pred_o["desc"].shape == (1, 8, 8, 256)
    assert pred_o["encoder_output"].shape == (1, 8, 8, 48)
    assert pred_hm.shape == (1, 8)


def test_regnet_shapes():
    m = RegNet()
    x = jnp.zeros((2, 32, 32, 48))
    params = m.init(jax.random.PRNGKey(0), x, x)
    y = m.apply(params, x, x)
    assert y.shape == (2, 8)


def test_vssm_m0_forward():
    """Mamba-2 (m0) forward type: shapes + finiteness."""
    model = VSSM(depths=(1, 1, 1, 1), embed_dim=32, use_m0=True,
                 d_state=16, ssm_ratio=2.0, disable_z=False)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 64, 1)),
                    dtype=jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_batched_pair_forward_matches_separate():
    """Shared-encoder eval-mode forward_pair stacks both spectra into one
    pass; results must equal two separate forwards exactly (eval-mode BN
    uses running statistics, so batching is semantics-preserving)."""
    module, cfg = build_xpoint({"multispectral": False,
                                "descriptor_head": True,
                                "homography_regression_head": {"check": False}})
    rng = np.random.default_rng(3)
    img_o = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)), jnp.float32)
    img_t = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), img_o,
                            method=module.init_all)
    po, pt, _ = module.apply(variables, img_o, img_t,
                             method=module.forward_pair)
    so = module.apply(variables, img_o, "optical")
    st = module.apply(variables, img_t, "thermal")
    for k in ("logits", "desc"):
        np.testing.assert_allclose(np.asarray(po[k]), np.asarray(so[k]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pt[k]), np.asarray(st[k]),
                                   atol=1e-5)


def test_spectral_norm_stats_train_eval_consistency():
    """Guards the cross-modal BN collapse (models/heads.py
    SpectralBatchNorm): the takes_pair train step forwards the two spectra
    separately, so train-mode BN normalizes each modality by its own batch
    statistics; plain BN then evaluates BOTH modalities with one shared
    running average, and the modality gap the training never saw flows
    straight into the descriptors (measured 0.95 -> 0.33 corresponding-cell
    cosine on the mini-corpus cycle). With spectral_norm_stats the eval
    descriptors must stay close to what training optimized; with plain BN
    they must NOT (if they did, the flag would be dead code)."""
    import optax
    from xpoint_tpu.losses import XPointLoss
    from xpoint_tpu.parallel import make_train_step, TrainState

    rng = np.random.default_rng(0)
    base = rng.uniform(size=(2, 64, 64)).astype(np.float32)
    optical = base
    thermal = np.clip(base ** 2.2 * 1.5 - 0.2, 0, 1)  # strong affine+gamma gap
    kp = (rng.uniform(size=(2, 64, 64)) > 0.99).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    batch = jax.tree.map(jnp.asarray, {
        'optical': {'image': optical[..., None], 'keypoints': kp,
                    'valid_mask': np.ones((2, 64, 64), np.float32),
                    'homography': eye},
        'thermal': {'image': thermal[..., None], 'keypoints': kp,
                    'valid_mask': np.ones((2, 64, 64), np.float32),
                    'homography': eye}})
    loss_fn = XPointLoss({'detector_loss': True, 'descriptor_loss': True,
                          'descriptor_loss_threshold': 4.0,
                          'positive_margin': 1.0, 'negative_margin': 0.2,
                          'lambda_d': 250, 'lambda': 1.0})

    def train_then_eval_diag_cos(spectral):
        module, _ = build_xpoint({
            'multispectral': False, 'takes_pair': True,
            'channel_version': 2, 'descriptor_size': 32,
            'spectral_norm_stats': spectral,
            'homography_regression_head': {'check': False}})
        variables = jax.jit(lambda r: module.init(
            r, jnp.zeros((1, 64, 64, 1)), method=module.init_all))(
            jax.random.PRNGKey(0))
        state = TrainState.create(variables['params'],
                                  variables.get('batch_stats'),
                                  optax.adam(1e-3))
        step = make_train_step(module, loss_fn, takes_pair=True,
                               donate=False)
        # 80 steps: measured margins spectral 0.95 / plain 0.12 (120 steps
        # add wall time, not discrimination — gap 0.83 vs 0.86)
        for it in range(80):
            state, _ = step(state, batch,
                            jax.random.fold_in(jax.random.PRNGKey(1), it))
        v = {'params': state.params, 'batch_stats': state.batch_stats}
        po = jax.jit(module.apply, static_argnums=2)(
            v, batch['optical']['image'], 'optical')
        pt = jax.jit(module.apply, static_argnums=2)(
            v, batch['thermal']['image'], 'thermal')
        do = np.asarray(po['desc']).reshape(-1, 32)
        dt = np.asarray(pt['desc']).reshape(-1, 32)
        return float((do * dt).sum(1).mean())

    cos_spectral = train_then_eval_diag_cos(True)
    cos_plain = train_then_eval_diag_cos(False)
    # training pushes corresponding cells toward cosine 1 in BOTH cases;
    # only per-spectrum running stats carry that into eval mode
    assert cos_spectral > 0.8, cos_spectral
    assert cos_plain < cos_spectral - 0.15, (cos_plain, cos_spectral)

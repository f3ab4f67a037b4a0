"""Gold-standard checkpoint-conversion parity: run the actual reference
torch model, convert its state_dict, and compare forward outputs."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from xpoint_tpu.models import build_xpoint
from xpoint_tpu.compat import convert_torch_state_dict
from xpoint_tpu.ops.detector import prob_from_logits

from reference_oracle import get_reference


def _forward_jax(module, variables, img_nchw, spectrum="optical"):
    img = jnp.asarray(np.transpose(img_nchw, (0, 2, 3, 1)))
    out = module.apply(variables, img, spectrum)
    prob = prob_from_logits(out["logits"], module.encoder_downsample_ratio)
    return np.asarray(prob), np.asarray(out["desc"]).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("multispectral", [False, True])
def test_cnn_checkpoint_conversion_parity(multispectral):
    XPointRef = get_reference()
    cfg = {"multispectral": multispectral,
           "homography_regression_head": {"check": False}}
    ref = XPointRef(dict(cfg))
    ref.eval()

    module, mcfg = build_xpoint(cfg)
    variables = convert_torch_state_dict(ref.state_dict(), module, mcfg)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        data = {"image": torch.from_numpy(img)}
        if multispectral:
            data["is_optical"] = torch.ones(2, 1, dtype=torch.bool)
        out_ref = ref.forward_impl(data)
    prob_ref = out_ref["prob"][:, 0].numpy()
    desc_ref = out_ref["desc"].numpy()

    prob, desc = _forward_jax(module, variables, img)
    np.testing.assert_allclose(prob, prob_ref, atol=1e-4)
    np.testing.assert_allclose(desc, desc_ref, atol=1e-4)


def test_vmamba_checkpoint_conversion_parity(tmp_path):
    """Full production-config VSSM encoder conversion: reference VMamba
    (v05_noz, d_state 1, torch backend) vs our NHWC VSSM."""
    XPointRef = get_reference()

    vssm_params = {
        "DATA": {"IMG_SIZE": 512},
        "MODEL": {
            "DROP_PATH_RATE": 0.2,
            "VSSM": {
                "DEPTHS": [1, 1, 1, 1], "EMBED_DIM": 32,
                "MLP_RATIO": 4.0, "PATCHEMBED": "v2", "DOWNSAMPLE": "v3",
                "SSM_CONV": 3, "SSM_CONV_BIAS": False,
                "SSM_DT_RANK": "auto", "SSM_D_STATE": 1,
                "SSM_FORWARDTYPE": "v05_noz", "SSM_RATIO": 1.0,
            },
        },
    }
    yaml_file = tmp_path / "vssm_tiny.yaml"
    yaml_file.write_text("MODEL:\n  TYPE: vssm\n  NAME: vssm_test\n")

    cfg = {
        "multispectral": False,
        "homography_regression_head": {"check": False},
        "use_attention": {
            "check": True, "type": "VMamba", "height": 64, "width": 64,
            "model_parameters": vssm_params,
            "pretrained": {"check": True, "yaml_file": str(yaml_file)},
        },
    }
    ref = XPointRef(dict(cfg))
    ref.eval()

    module, mcfg = build_xpoint(cfg)
    variables = convert_torch_state_dict(ref.state_dict(), module, mcfg)

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(1, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref.forward_impl({"image": torch.from_numpy(img)})
    prob_ref = out_ref["prob"][:, 0].numpy()
    desc_ref = out_ref["desc"].numpy()

    prob, desc = _forward_jax(module, variables, img)
    np.testing.assert_allclose(prob, prob_ref, atol=5e-4)
    np.testing.assert_allclose(desc, desc_ref, atol=5e-3)


@pytest.mark.parametrize("ftype,tol", [("v05", 5e-4), ("v051d_noz", 5e-4),
                                       ("v052d_noz", 5e-4), ("v05_noz_oact", 5e-4)])
def test_vmamba_forward_type_variants_parity(tmp_path, ftype, tol):
    """SS2D variant parity: gated (v05), unidirectional (v051d),
    bidirectional (v052d), output-GELU (_oact)."""
    XPointRef = get_reference()
    vssm_params = {
        "DATA": {"IMG_SIZE": 512},
        "MODEL": {"DROP_PATH_RATE": 0.2,
                  "VSSM": {"DEPTHS": [1, 1, 1, 1], "EMBED_DIM": 32,
                           "MLP_RATIO": 4.0, "PATCHEMBED": "v2",
                           "DOWNSAMPLE": "v3", "SSM_CONV": 3,
                           "SSM_CONV_BIAS": False, "SSM_DT_RANK": "auto",
                           "SSM_D_STATE": 2, "SSM_FORWARDTYPE": ftype,
                           "SSM_RATIO": 2.0}}}
    yaml_file = tmp_path / "v.yaml"
    yaml_file.write_text("MODEL:\n  TYPE: vssm\n")
    cfg = {"multispectral": False,
           "homography_regression_head": {"check": False},
           "use_attention": {"check": True, "type": "VMamba",
                             "height": 32, "width": 32,
                             "model_parameters": vssm_params,
                             "pretrained": {"check": True,
                                            "yaml_file": str(yaml_file)}}}
    ref = XPointRef(dict(cfg))
    ref.eval()
    module, mcfg = build_xpoint(cfg)
    variables = convert_torch_state_dict(ref.state_dict(), module, mcfg)

    rng = np.random.default_rng(2)
    img = rng.uniform(size=(1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref.forward_impl({"image": torch.from_numpy(img)})
    prob, desc = _forward_jax(module, variables, img)
    np.testing.assert_allclose(prob, out_ref["prob"][:, 0].numpy(), atol=tol)


def test_pretrained_encoder_bootstrap(tmp_path):
    """backbone.-prefixed VSSM checkpoint loads into the XPoint encoder."""
    import jax
    from xpoint_tpu.compat.torch_converter import convert_pretrained_encoder

    XPointRef = get_reference()
    vssm_params = {
        "DATA": {"IMG_SIZE": 512},
        "MODEL": {"DROP_PATH_RATE": 0.2,
                  "VSSM": {"DEPTHS": [1, 1, 1, 1], "EMBED_DIM": 32,
                           "MLP_RATIO": 4.0, "PATCHEMBED": "v2",
                           "DOWNSAMPLE": "v3", "SSM_CONV": 3,
                           "SSM_CONV_BIAS": False, "SSM_DT_RANK": "auto",
                           "SSM_D_STATE": 1, "SSM_FORWARDTYPE": "v05_noz",
                           "SSM_RATIO": 1.0}}}
    yaml_file = tmp_path / "v.yaml"
    yaml_file.write_text("MODEL:\n  TYPE: vssm\n")
    cfg = {"multispectral": False,
           "homography_regression_head": {"check": False},
           "use_attention": {"check": True, "type": "VMamba",
                             "height": 32, "width": 32,
                             "model_parameters": vssm_params,
                             "pretrained": {"check": True,
                                            "yaml_file": str(yaml_file)}}}
    ref = XPointRef(dict(cfg))
    # fake a pretrained backbone checkpoint: encoder keys with backbone. prefix
    enc_sd = {("backbone." + k[len("encoder."):]): v.numpy()
              for k, v in ref.state_dict().items() if k.startswith("encoder.")}

    module, mcfg = build_xpoint(cfg)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 1)), method=module.init_all)
    new_vars = convert_pretrained_encoder(enc_sd, module, variables)
    # encoder weights replaced, heads untouched
    ref_w = ref.state_dict()["encoder.patch_embed.0.weight"].numpy()
    got = np.asarray(new_vars["params"]["encoder"]["patch_embed_conv1"]["kernel"])
    np.testing.assert_allclose(got, ref_w.transpose(2, 3, 1, 0), atol=1e-6)


def test_vmamba_cascade2d_parity(tmp_path):
    """cascade2d (v052dc) forward-type parity vs the reference."""
    XPointRef = get_reference()
    vssm_params = {
        "DATA": {"IMG_SIZE": 512},
        "MODEL": {"DROP_PATH_RATE": 0.2,
                  "VSSM": {"DEPTHS": [1, 1, 1, 1], "EMBED_DIM": 32,
                           "MLP_RATIO": 4.0, "PATCHEMBED": "v2",
                           "DOWNSAMPLE": "v3", "SSM_CONV": 3,
                           "SSM_CONV_BIAS": False, "SSM_DT_RANK": "auto",
                           "SSM_D_STATE": 2,
                           "SSM_FORWARDTYPE": "v052dc_noz",
                           "SSM_RATIO": 2.0}}}
    yaml_file = tmp_path / "v.yaml"
    yaml_file.write_text("MODEL:\n  TYPE: vssm\n")
    cfg = {"multispectral": False,
           "homography_regression_head": {"check": False},
           "use_attention": {"check": True, "type": "VMamba",
                             "height": 32, "width": 32,
                             "model_parameters": vssm_params,
                             "pretrained": {"check": True,
                                            "yaml_file": str(yaml_file)}}}
    ref = XPointRef(dict(cfg))
    ref.eval()
    module, mcfg = build_xpoint(cfg)
    variables = convert_torch_state_dict(ref.state_dict(), module, mcfg)

    rng = np.random.default_rng(5)
    img = rng.uniform(size=(1, 1, 32, 32)).astype(np.float32)
    # the reference cascade2d path crashes on a non-contiguous .view
    # (VMamba.py:643); substitute reshape (identical semantics) to run it
    orig_view = torch.Tensor.view

    def safe_view(self, *args):
        try:
            return orig_view(self, *args)
        except RuntimeError:
            return self.reshape(*args)

    torch.Tensor.view = safe_view
    try:
        with torch.no_grad():
            out_ref = ref.forward_impl({"image": torch.from_numpy(img)})
    finally:
        torch.Tensor.view = orig_view
    prob, _ = _forward_jax(module, variables, img)
    np.testing.assert_allclose(prob, out_ref["prob"][:, 0].numpy(), atol=1e-3)

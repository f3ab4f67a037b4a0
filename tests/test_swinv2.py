"""SwinV2 encoder parity vs the reference torch implementation through
converted weights."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from xpoint_tpu.models import build_xpoint
from xpoint_tpu.compat import convert_torch_state_dict
from xpoint_tpu.ops.detector import prob_from_logits

from reference_oracle import get_reference


def _swin_cfg(height, width):
    return {
        "multispectral": False,
        "homography_regression_head": {"check": False},
        "use_attention": {
            "check": True, "type": "Swinv2", "height": height, "width": width,
            "model_parameters": {
                "DATA": {"IMG_SIZE": height},
                "MODEL": {
                    "DROP_PATH_RATE": 0.2,
                    "SWINV2": {
                        "EMBED_DIM": 16, "DEPTHS": [1, 1, 1, 1],
                        "NUM_HEADS": [1, 2, 4, 8], "WINDOW_SIZE": 4,
                        "MLP_RATIO": 4.0,
                    },
                },
            },
            "pretrained": {"check": True},
        },
    }


@pytest.mark.parametrize("size", [(64, 64), (96, 96)])
def test_swin_checkpoint_conversion_parity(size):
    XPointRef = get_reference()
    cfg = _swin_cfg(*size)
    ref = XPointRef(dict(cfg))
    ref.eval()

    module, mcfg = build_xpoint(cfg)
    assert module.encoder_type == "swin"
    assert module.n_channels[4] == 8          # 16 * 2^3 / 16
    variables = convert_torch_state_dict(ref.state_dict(), module, mcfg)

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 1) + size).astype(np.float32)
    with torch.no_grad():
        out_ref = ref.forward_impl({"image": torch.from_numpy(img)})
    prob_ref = out_ref["prob"][:, 0].numpy()
    desc_ref = out_ref["desc"].numpy()

    img_j = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    # jitted apply: eager swin dispatch on the 1-core runner dominated this
    # parity test; the jitted program hits the persistent cache on reruns
    out = jax.jit(module.apply, static_argnums=2)(variables, img_j, "optical")
    prob = np.asarray(prob_from_logits(out["logits"],
                                       module.encoder_downsample_ratio))
    desc = np.asarray(out["desc"]).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(prob, prob_ref, atol=5e-4)
    np.testing.assert_allclose(desc, desc_ref, atol=5e-3)

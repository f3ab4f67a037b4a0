"""MagicLeap SuperPoint in flax.linen (NHWC).

Parity: reference xpoint/models/SuperPointMagicLeap.py (itself the public
MagicLeap network): VGG encoder (4 double-conv blocks, 3 maxpools), 65-ch
detector head, 256-d descriptor head L2-normed at the coarse level. The
reference's numpy softmax/reshape heatmap (:69-86) maps channel c ->
offset (c // 8, c % 8), identical to ops.detector.prob_from_logits.
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.detector import prob_from_logits


class SuperPointMagicLeap(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, spectrum=None, is_optical=None, train=False):
        """image (B, H, W, 1) -> {'logits', 'desc', 'prob'} (NHWC)."""
        x = image.astype(self.dtype)
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256

        def conv(x, ch, name, k=3):
            pad = [(1, 1), (1, 1)] if k == 3 else [(0, 0), (0, 0)]
            return nn.Conv(ch, (k, k), padding=pad, dtype=self.dtype,
                           name=name)(x)

        x = nn.relu(conv(x, c1, "conv1a"))
        x = nn.relu(conv(x, c1, "conv1b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, c2, "conv2a"))
        x = nn.relu(conv(x, c2, "conv2b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, c3, "conv3a"))
        x = nn.relu(conv(x, c3, "conv3b"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(x, c4, "conv4a"))
        x = nn.relu(conv(x, c4, "conv4b"))

        cPa = nn.relu(conv(x, c5, "convPa"))
        semi = conv(cPa, 65, "convPb", k=1).astype(jnp.float32)
        cDa = nn.relu(conv(x, c5, "convDa"))
        desc = conv(cDa, d1, "convDb", k=1).astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

        return {"logits": semi, "desc": desc,
                "prob": prob_from_logits(semi, 8)}

    # interface parity with XPointNet
    def forward_impl(self, image, spectrum="optical", is_optical=None,
                     train=False):
        return self(image)

    def init_all(self, image, train=False):
        return self(image)

    def forward_pair(self, img_o, img_t, train=False, optical_not_warped=None):
        return self(img_o), self(img_t), None

    @property
    def encoder_downsample_ratio(self):
        return 8


def convert_magicleap_weights(state_dict):
    """Convert the released MagicLeap superpoint_v1.pth state dict
    (conv1a..convDb torch convs) to this module's params tree."""
    import numpy as np
    params = {}
    for name in ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                 "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]:
        w = np.asarray(state_dict[f"{name}.weight"], np.float32)
        b = np.asarray(state_dict[f"{name}.bias"], np.float32)
        params[name] = {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}
    return {"params": params}


def build_superpoint(config=None):
    return SuperPointMagicLeap(), dict(config or {})

"""RegNet homography-regression head (flax.linen, NHWC).

Parity: /root/reference/xpoint/models/RegNet.py — siamese conv backbone on
the two encoder outputs, L2-normalized cost volume bmm(x1^T, x2), global
average pool, FC -> 8-vector of corner displacements.
"""
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class RegNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train=False):
        # siamese backbone: instantiate layers once, apply to both inputs
        conv1 = nn.Conv(96, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="conv1")
        bn1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32, name="bn1")
        conv2 = nn.Conv(192, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name="conv2")
        bn2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32, name="bn2")

        def backbone(x):
            x = nn.relu(bn1(conv1(x))).astype(self.dtype)
            x = nn.relu(bn2(conv2(x))).astype(self.dtype)
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        x1 = backbone(x1)
        x2 = backbone(x2)

        # The reference hardcodes fc1 to 256 = (256/8/2)^2 inputs, i.e. it
        # only works for 256x256 images. Adaptive-average-pool the encoder
        # features to 16x16 first — a no-op at the production resolution,
        # resolution-independent everywhere else.
        def to_16(x):
            N, H, W, C = x.shape
            if H == 16 and W == 16:
                return x
            if H % 16 == 0 and W % 16 == 0:     # exact block average
                return x.reshape(N, 16, H // 16, 16, W // 16, C).mean(axis=(2, 4))
            return jax.image.resize(x, (N, 16, 16, C), method="linear")

        x1 = to_16(x1)
        x2 = to_16(x2)

        # cost volume (RegNet.py:44-53): normalize over channels, bmm
        def l2norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        N, H, W, C = x1.shape
        f1 = l2norm(x1).reshape(N, H * W, C)
        f2 = l2norm(x2).reshape(N, H * W, C)
        cv = jnp.einsum("bic,bjc->bij", f1, f2,
                        preferred_element_type=jnp.float32)   # (N, HW, HW)
        # reference reshapes to (N, HW, H, W) then AdaptiveAvgPool2d(1):
        # equivalent to mean over the second HW axis
        pooled = cv.mean(axis=2)                               # (N, HW)

        x = nn.Dropout(0.5, deterministic=not train)(pooled)
        x = nn.Dense(64, dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(8, dtype=jnp.float32, name="fc2")(x)

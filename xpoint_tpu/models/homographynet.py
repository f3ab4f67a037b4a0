"""HomographyNet-style regression head on channel-mean encoder maps.

The reference's 'HomographyNet' dispatch (XPoint.py:194-208) builds the
2-channel input from order-swapped channel means but then calls the RegNet
module with a single argument — a latent defect that crashes if exercised
(RegNet.forward takes two tensors; production configs use type 'RegNet').
Here the path is implemented functionally: a small DeepHomography-style
conv stack over the concatenated mean maps -> 8 corner displacements.
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class HomographyNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # x: (B, Hc, Wc, 2) concatenated channel-mean encoder maps
        for i, feats in enumerate((64, 64, 128, 128)):
            x = nn.Conv(feats, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
            x = nn.relu(x).astype(self.dtype)
            if i % 2 == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))                       # global average pool
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(256, dtype=jnp.float32)(x))
        return nn.Dense(8, dtype=jnp.float32)(x)

"""Detector / descriptor heads and the plain-CNN encoder (flax.linen, NHWC).

Parity targets in /root/reference/xpoint/models/XPoint.py:
  detector head   :112-125  pad1 -> conv3(256) -> ReLU -> BN -> conv1(r^2+1) -> BN
  descriptor head :127-138  pad1 -> conv3(256) -> ReLU -> BN -> conv1(desc) -> BN
  CNN encoder     :452-466  4 double-conv blocks with 3 maxpools, channels
                            [1, 64, 64, 128, 128] (channel_version 0)
Head outputs are cast to float32 like the reference (:349, :363).
"""
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


def _pad(x, reflection=True):
    mode = "reflect" if reflection else "constant"
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


class ConvBNRelu(nn.Module):
    """pad -> conv3 valid -> nonlinearity with BN placed per bn_first."""
    features: int
    reflection_pad: bool = True
    bn_first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = _pad(x, self.reflection_pad)
        x = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype)(x)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32)
        if self.bn_first:
            x = nn.relu(bn(x))
        else:
            x = bn(nn.relu(x))
        return x.astype(self.dtype)


class CNNEncoder(nn.Module):
    """VGG-ish encoder, downsample ratio 8 (XPoint.py:452-466)."""
    n_channels: Sequence[int] = (1, 64, 64, 128, 128)
    reflection_pad: bool = True
    bn_first: bool = False
    double_convolution: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        for i in range(4):
            x = ConvBNRelu(self.n_channels[i + 1], self.reflection_pad,
                           self.bn_first, self.dtype)(x, train)
            if self.double_convolution:
                x = ConvBNRelu(self.n_channels[i + 1], self.reflection_pad,
                               self.bn_first, self.dtype)(x, train)
            if i < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class Head(nn.Module):
    """Shared head structure: pad1-conv3(head_ch)-ReLU-BN-conv1(out)-[BN]."""
    head_channels: int
    out_channels: int
    final_batchnorm: bool = True
    reflection_pad: bool = True
    bn_first: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBNRelu(self.head_channels, self.reflection_pad,
                       self.bn_first, self.dtype)(x, train)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        if self.final_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
        return x.astype(jnp.float32)   # heads emit fp32 (XPoint.py:349,363)

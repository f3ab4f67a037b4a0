"""Detector / descriptor heads and the plain-CNN encoder (flax.linen, NHWC).

Parity targets in /root/reference/xpoint/models/XPoint.py:
  detector head   :112-125  pad1 -> conv3(256) -> ReLU -> BN -> conv1(r^2+1) -> BN
  descriptor head :127-138  pad1 -> conv3(256) -> ReLU -> BN -> conv1(desc) -> BN
  CNN encoder     :452-466  4 double-conv blocks with 3 maxpools, channels
                            [1, 64, 64, 128, 128] (channel_version 0)
Head outputs are cast to float32 like the reference (:349, :363).
"""
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def _pad(x, reflection=True):
    mode = "reflect" if reflection else "constant"
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


class SpectralBatchNorm(nn.Module):
    """BatchNorm with shared affine but PER-SPECTRUM running statistics
    (domain-specific batch normalization), XPoint-TPU extension enabled by
    `model: spectral_norm_stats: true`.

    Why: with a shared encoder, the takes_pair train step forwards the two
    spectra SEPARATELY (reference XPoint.py:186-214 does the same), so
    train-mode BN normalizes each spectrum by its own batch statistics —
    implicitly removing the per-modality channel statistics that make
    optical/thermal features incomparable, and the descriptor hinge loss
    converges against those modality-normalized features. Plain BN throws
    that property away at eval (ONE running average for both spectra):
    measured on the mini-corpus cycle, corresponding-cell descriptor
    cosine collapses 0.95 (train-mode stats) -> 0.33 (shared eval stats)
    on the SAME trained weights, pinning NN-mAP at noise level. Keeping
    one running (mean, var) per spectrum makes eval consistent with what
    training optimized. 'mixed' batches (single_image training) update
    both slots and evaluate with their average.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, spectrum="mixed", train=False):
        C = x.shape[-1]
        x32 = x.astype(jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        stats = {
            s: (self.variable("batch_stats", f"mean_{s}",
                              lambda: jnp.zeros((C,), jnp.float32)),
                self.variable("batch_stats", f"var_{s}",
                              lambda: jnp.ones((C,), jnp.float32)))
            for s in ("optical", "thermal")
        }
        if train:
            mean = x32.mean(axis=(0, 1, 2))
            var = x32.var(axis=(0, 1, 2))
            if not self.is_initializing():
                slots = (("optical", "thermal") if spectrum == "mixed"
                         else (spectrum,))
                for s in slots:
                    m, v = stats[s]
                    m.value = self.momentum * m.value + (1 - self.momentum) * mean
                    v.value = self.momentum * v.value + (1 - self.momentum) * var
        elif spectrum == "mixed":
            # true 50/50 mixture statistics: the mixture variance includes
            # the between-spectrum mean-gap term, which is exactly the
            # quantity this module exists to track (a plain average of the
            # two variances mis-scales mixed-batch eval when the modality
            # gap is large)
            m_o = stats["optical"][0].value
            m_t = stats["thermal"][0].value
            mean = 0.5 * (m_o + m_t)
            var = (0.5 * (stats["optical"][1].value + stats["thermal"][1].value)
                   + 0.25 * (m_o - m_t) ** 2)
        else:
            mean, var = stats[spectrum][0].value, stats[spectrum][1].value
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y


class ConvBNRelu(nn.Module):
    """pad -> conv3 valid -> nonlinearity with BN placed per bn_first."""
    features: int
    reflection_pad: bool = True
    bn_first: bool = False
    dtype: Any = jnp.float32
    spectral_stats: bool = False

    @nn.compact
    def __call__(self, x, train=False, spectrum="mixed"):
        x = _pad(x, self.reflection_pad)
        x = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype)(x)
        if self.spectral_stats:
            bn_mod = SpectralBatchNorm()
            bn = lambda z: bn_mod(z, spectrum, train)  # noqa: E731
        else:
            bn_mod = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=jnp.float32)
            bn = bn_mod
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
    spectral_stats: bool = False

    @nn.compact
    def __call__(self, x, train=False, spectrum="mixed"):
        x = x.astype(self.dtype)
        for i in range(4):
            x = ConvBNRelu(self.n_channels[i + 1], self.reflection_pad,
                           self.bn_first, self.dtype,
                           self.spectral_stats)(x, train, spectrum)
            if self.double_convolution:
                x = ConvBNRelu(self.n_channels[i + 1], self.reflection_pad,
                               self.bn_first, self.dtype,
                               self.spectral_stats)(x, train, spectrum)
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
    spectral_stats: bool = False

    @nn.compact
    def __call__(self, x, train=False, spectrum="mixed"):
        x = ConvBNRelu(self.head_channels, self.reflection_pad,
                       self.bn_first, self.dtype,
                       self.spectral_stats)(x, train, spectrum)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        if self.final_batchnorm:
            if self.spectral_stats:
                x = SpectralBatchNorm()(x, spectrum, train)
            else:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32)(x)
        return x.astype(jnp.float32)   # heads emit fp32 (XPoint.py:349,363)

"""Shared flax building blocks.

Norm policy: the reference uses ``naiveSyncBN1d/2d`` (all-reduce batch
norm, ``ops/norm.py:9-96``) under DDP.  Here BatchNorm carries an
optional ``axis_name`` — when set (the data-parallel mesh axis), flax
computes cross-device batch statistics with a ``psum``, which is exactly
the naiveSyncBN semantics expressed the XLA way.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from omnihd_scenes_tpu.models.quant import Conv as QConv

# Default BN hyperparams in the reference configs: eps=1e-3, momentum=0.01
# (torch momentum 0.01 == flax momentum 0.99).
BN_EPS = 1e-3
BN_MOMENTUM = 0.99


class ConvBNReLU(nn.Module):
    """Conv2D -> (sync)BN -> ReLU, NHWC.

    Default padding is torch-style symmetric ``k // 2`` rather than
    flax ``'SAME'``: for stride-1 3x3 convs they are identical, but for
    strided convs ``'SAME'`` pads asymmetrically ((0, 1) on even
    extents) while the reference's ``nn.Conv2d(padding=1)`` pads
    (1, 1) — a one-pixel sampling-grid shift that the full-graph torch
    parity test (tests/test_full_graph_parity.py) would catch.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str | Sequence[Tuple[int, int]] = 'torch'
    use_relu: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        padding = self.padding
        if padding == 'torch':
            padding = [(k // 2, k // 2) for k in self.kernel_size]
        x = QConv(self.features, self.kernel_size, strides=self.strides,
                  padding=padding, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class DeconvBNReLU(nn.Module):
    """ConvTranspose2D -> BN -> ReLU (SECONDFPN upsample block)."""

    features: int
    stride: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.stride >= 1:
            x = nn.ConvTranspose(self.features,
                                 (self.stride, self.stride),
                                 strides=(self.stride, self.stride),
                                 use_bias=False)(x)
        else:  # fractional stride = strided conv downsample
            s = int(round(1 / self.stride))
            x = QConv(self.features, (s, s), strides=(s, s),
                      use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name)(x)
        return nn.relu(x)


class SEBlock(nn.Module):
    """Squeeze-excitation gate used by the BEVFusion fuser
    (reference ``bevf_faster_rcnn.py`` SE_Block)."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = jnp.mean(x, axis=(-3, -2), keepdims=True)
        w = nn.Conv(self.features, (1, 1))(w)
        return x * nn.sigmoid(w)

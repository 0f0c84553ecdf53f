"""SECOND backbone + SECONDFPN neck (NHWC, flax).

Parity target: mmdet3d ``SECOND``/``SECONDFPN`` as configured by the
reference (``configs/PointPillars_NewScenes/pointpillars_4DRadar.py:42-54``):
three stages (3/5/5 convs, strides 2/2/2, channels 64/128/256), FPN
deconv upsampling (1/2/4) to a common resolution, concat -> 384 ch.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from omnihd_scenes_tpu.models.layers import ConvBNReLU, DeconvBNReLU


class SECOND(nn.Module):
    """Multi-stage BEV conv backbone."""

    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    out_channels: Sequence[int] = (64, 128, 256)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for num_layers, stride, ch in zip(self.layer_nums, self.layer_strides,
                                          self.out_channels):
            x = ConvBNReLU(ch, (3, 3), strides=(stride, stride),
                           axis_name=self.axis_name)(x, train)
            for _ in range(num_layers):
                x = ConvBNReLU(ch, (3, 3), axis_name=self.axis_name)(x, train)
            outs.append(x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    """Per-scale deconv to a common stride, channel concat."""

    upsample_strides: Sequence[int] = (1, 2, 4)
    out_channels: Sequence[int] = (128, 128, 128)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = True) -> jnp.ndarray:
        ups = [DeconvBNReLU(ch, stride, axis_name=self.axis_name)(f, train)
               for f, stride, ch in zip(feats, self.upsample_strides,
                                        self.out_channels)]
        # Guard non-divisible grids (rounding in strided convs can leave
        # the deepest level one texel larger after upsampling).
        min_h = min(u.shape[-3] for u in ups)
        min_w = min(u.shape[-2] for u in ups)
        ups = [u[..., :min_h, :min_w, :] for u in ups]
        return jnp.concatenate(ups, axis=-1)

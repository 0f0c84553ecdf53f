"""FPN + FPNC neck (flax, NHWC).

Parity target: ``FPNC`` (reference ``bevfusion/necks/fpnc.py:45-118``) —
a standard FPN whose multi-scale outputs are bilinear-resized to
``final_dim / downsample``, concatenated and reduced to ``outC``
channels, producing the single-scale image feature the LSS view
transform consumes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from omnihd_scenes_tpu.models.quant import Conv as QConv
import jax
import jax.numpy as jnp


def _resize_bilinear(x, hw):
    if x.shape[-3:-1] == tuple(hw):
        return x
    return jax.image.resize(x, x.shape[:-3] + tuple(hw) + x.shape[-1:],
                            method='bilinear')


class FPN(nn.Module):
    """Top-down feature pyramid over backbone stages."""

    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        laterals = [QConv(self.out_channels, (1, 1))(f) for f in feats]
        for i in range(len(laterals) - 1, 0, -1):
            up = _resize_bilinear(laterals[i], laterals[i - 1].shape[-3:-1])
            laterals[i - 1] = laterals[i - 1] + up
        outs = [QConv(self.out_channels, (3, 3), padding='SAME')(l)
                for l in laterals]
        return tuple(outs[:self.num_outs])


class FPNC(nn.Module):
    """FPN -> resize-to-common -> concat -> reduce conv."""

    out_channels: int = 256
    outC: int = 256
    target_hw: Tuple[int, int] = (136, 240)   # final_dim / downsample

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = True):
        outs = FPN(out_channels=self.out_channels,
                   num_outs=len(feats))(feats)
        resized = [_resize_bilinear(f, self.target_hw) for f in outs]
        x = jnp.concatenate(resized, axis=-1)
        x = QConv(self.outC, (3, 3), padding='SAME', use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)

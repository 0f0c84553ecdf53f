"""ResNet image backbones (flax, NHWC).

Parity target: torchvision/mmcv ResNet-18/50 as used by the reference
image branches (``img_backbone`` R50 with ``norm_eval=True`` frozen BN,
out_indices (0,1,2,3), e.g. ``configs/bevfusion_NewScenes/bevfusion.py``).
``norm_eval`` maps to ``frozen_bn=True``: batch stats are never updated
and BN always uses running averages — the statistics behave as
constants, matching the reference's frozen backbone training dynamics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn

from omnihd_scenes_tpu.models.quant import Conv as QConv
import jax.numpy as jnp

from omnihd_scenes_tpu.models.dcn import DeformConv


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    use_running_average: bool = True
    dcn: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        conv3 = (DeformConv if self.dcn else
                 lambda f, k, **kw: QConv(f, (k, k),
                                            padding=[(1, 1), (1, 1)], **kw))
        y = conv3(self.features, 3, strides=(self.strides, self.strides)
                  if not self.dcn else self.strides, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=self.use_running_average)(y)
        y = nn.relu(y)
        y = conv3(self.features, 3, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=self.use_running_average)(y)
        if residual.shape != y.shape:
            residual = QConv(self.features, (1, 1),
                               strides=(self.strides,) * 2,
                               use_bias=False)(x)
            residual = nn.BatchNorm(
                use_running_average=self.use_running_average)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    use_running_average: bool = True
    dcn: bool = False          # DCNv2 on the 3x3 conv (reference
                               # R101-DCN stages, mmcv dcn=DCNv2)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = QConv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=self.use_running_average)(y)
        y = nn.relu(y)
        if self.dcn:
            y = DeformConv(self.features, 3, strides=self.strides,
                           use_bias=False)(y)
        else:
            y = QConv(self.features, (3, 3),
                        strides=(self.strides,) * 2,
                        padding=[(1, 1), (1, 1)], use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=self.use_running_average)(y)
        y = nn.relu(y)
        y = QConv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=self.use_running_average)(y)
        if residual.shape != y.shape:
            residual = QConv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2,
                               use_bias=False)(x)
            residual = nn.BatchNorm(
                use_running_average=self.use_running_average)(residual)
        return nn.relu(y + residual)


_ARCHS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


class ResNet(nn.Module):
    """Multi-stage ResNet; returns features at the requested stages."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_bn: bool = True          # reference norm_eval=True
    stem_channels: int = 64
    # Per-stage DCNv2 switch (reference R101-DCN:
    # stage_with_dcn=(False, True, True, True)).
    stage_with_dcn: Tuple[bool, bool, bool, bool] = (False,) * 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls, stage_blocks = _ARCHS[self.depth]
        # Frozen BN ignores `train`; otherwise stats update in training.
        ura = True if self.frozen_bn else (not train)

        x = QConv(self.stem_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=ura)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        features = 64
        for i, n_blocks in enumerate(stage_blocks):
            stride = 1 if i == 0 else 2
            dcn = self.stage_with_dcn[i]
            x = block_cls(features, strides=stride,
                          use_running_average=ura, dcn=dcn)(x)
            for _ in range(n_blocks - 1):
                x = block_cls(features, use_running_average=ura,
                              dcn=dcn)(x)
            if i in self.out_indices:
                outs.append(x)
            features *= 2
        return tuple(outs)

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
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.quant import Conv as QConv

from omnihd_scenes_tpu.models.dcn import DeformConv


def space_to_depth(x):
    """(..., H, W, C) -> (..., H/2, W/2, 4C), phase order (qy, qx, c).

    The host-side packing dual of the ``stem_s2d`` stem below.  Done in
    the data pipeline (a reshape during the existing resize/pad pass) so
    the device never pays the 3-channel relayout — the round-3 probe
    measured the DEVICE-side version at 10.5 ms vs 4.5 for the direct
    7x7 conv (BENCH.md "Negative results"), all of it in the relayout.
    """
    h, w, c = x.shape[-3:]
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    lead = x.shape[:-3]
    x = x.reshape(lead + (h // 2, 2, w // 2, 2, c))
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(lead + (h // 2, w // 2, 4 * c))


def space_to_depth_np(x):
    """NumPy version for host data pipelines (same packing order)."""
    import numpy as np
    h, w, c = x.shape[-3:]
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    lead = x.shape[:-3]
    x = x.reshape(lead + (h // 2, 2, w // 2, 2, c))
    x = np.moveaxis(x, -4, -3)
    return np.ascontiguousarray(x).reshape(lead + (h // 2, w // 2, 4 * c))


class _S2DStem(nn.Module):
    """ResNet stem as an exact 4x4/s1 conv on space-to-depth input.

    Mathematically identical to ``Conv(F, (7,7), strides 2, pad 3)`` on
    the raw image (the MLPerf ResNet trick): pad the 7x7 kernel to 8x8
    with a leading zero row/col, then fold the stride-2 phase into the
    channel dimension —
        out(i,j) = sum_{a,b,qy,qx,c} w8[2a+qy, 2b+qx, c]
                                     * x2[i-2+a, j-2+b, (qy,qx,c)]
    i.e. a 4x4 stride-1 conv with padding (2,1) whose input-channel axis
    is the (qy, qx, c) packing of ``space_to_depth``.  The parameter is
    stored in the ORIGINAL (7,7,C,F) shape under the same
    ``Conv_0/kernel`` path, so checkpoints / torch-import / fuse_conv_bn
    are oblivious; the rearrange is a 9.4k-element reshape per call.
    Why: the direct 7x7 on 3 channels runs at ~78 TFLOP/s (the MXU
    contracts 147 elements where the tile holds 256+); the folded conv
    contracts 192 at full tile occupancy.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        c4 = x.shape[-1]
        assert c4 % 4 == 0, c4
        c = c4 // 4
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (7, 7, c, self.features), jnp.float32)
        # Keep the 'quant' variable tree identical to the QConv stem:
        # space_to_depth only rearranges pixels, so max|x| (and hence
        # act_amax) is bit-equal to what the standard stem would record.
        # Without this, calibrating with stem_s2d=True and serving the
        # standard stem in int8 mode would fail on the missing amax.
        # The conv itself always runs in float here (the stem is
        # excluded from the int8 tier in s2d mode — ~2% of FLOPs).
        from omnihd_scenes_tpu.models.quant import get_mode
        mode = get_mode()
        if mode in ('calib', 'qat'):
            amax = self.variable('quant', 'act_amax',
                                 lambda: jnp.zeros((), jnp.float32))
            batch_amax = jax.lax.stop_gradient(
                jnp.max(jnp.abs(x)).astype(jnp.float32))
            if not self.is_initializing():
                if mode == 'calib':
                    amax.value = jnp.maximum(amax.value, batch_amax)
                else:
                    amax.value = jnp.where(
                        amax.value > 0,
                        0.99 * amax.value + 0.01 * batch_amax,
                        batch_amax)
        w8 = jnp.pad(kernel.astype(x.dtype),
                     ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, c, self.features)
        w4 = w4.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            x, w4, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


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
    # Expect space_to_depth-packed input (H/2, W/2, 4C) and run the
    # exact folded stem (_S2DStem; same param tree).  The packing
    # happens on the HOST (data pipeline / serving input contract);
    # downstream shapes are unchanged.  The stem conv is excluded from
    # the int8 tier in this mode (negligible: ~2% of backbone FLOPs).
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls, stage_blocks = _ARCHS[self.depth]
        # Frozen BN ignores `train`; otherwise stats update in training.
        ura = True if self.frozen_bn else (not train)

        if self.stem_s2d:
            x = _S2DStem(self.stem_channels, name='Conv_0')(x)
        else:
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

"""Modulated deformable convolution v2 (flax).

Parity target: the ``DCNv2`` stages of the reference's BEVFormer-T
R101-DCN backbone (``projects/configs/bevformer_NewScenes/
bevformer_T_R101.py`` — mmcv ``ModulatedDeformConv2dPack`` with
``deform_groups=1``, applied to ResNet stages 2-4): a sibling 3x3 conv
predicts per-pixel offsets (2*K*K) and sigmoid modulation masks (K*K);
the main kernel is applied to bilinearly-sampled, mask-modulated taps.

TPU formulation: the sampling reuses
:func:`omnihd_scenes_tpu.ops.ms_deform_attn.bilinear_sample` (4-tap
gather); the K*K sampled maps are contracted against the kernel with a
single einsum (MXU).  The offset conv is zero-initialized (torch
``conv_offset`` init), so at init DCN equals a plain conv scaled by
sigmoid(0)=0.5 per tap — matching mmcv semantics exactly.

Note: per-pixel gathers are the weak op on this TPU backend; DCN is
correctness-complete (unblocks the R101-DCN model-zoo row) but not yet
speed-of-light.  The one-hot-matmul rewrite used for the LSS transform
does not apply (offsets are unstructured per pixel).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.ops.ms_deform_attn import bilinear_sample


class DeformConv(nn.Module):
    """DCNv2 3x3 (stride 1 or 2, 'torch pad 1' geometry)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) -> (B, H', W', features)."""
        k = self.kernel_size
        kk = k * k
        # Offset/mask branch: zero-init regular conv (mmcv
        # ModulatedDeformConv2dPack.conv_offset).
        off_mask = nn.Conv(
            3 * kk, (k, k), strides=(self.strides,) * 2,
            padding=[(k // 2, k // 2)] * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name='conv_offset')(x)
        # mmcv channel layout: ModulatedDeformConv2dPack chunks the
        # raw conv_offset output into (o1, o2, mask) and feeds
        # offset=cat(o1, o2) to a kernel that reads channel 2k as tap
        # k's y-offset and 2k+1 as its x-offset — i.e. the RAW layout
        # is interleaved (dy0, dx0, dy1, dx1, ..., mask0..KK).  Match
        # it exactly so imported reference .pth offsets land on the
        # right taps.
        off_y = off_mask[..., 0:2 * kk:2]
        off_x = off_mask[..., 1:2 * kk:2]
        mask = jax.nn.sigmoid(off_mask[..., 2 * kk:])

        kernel = self.param(
            'kernel', nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features)).reshape(
                kk, x.shape[-1], self.features)

        b, h, w, c = x.shape
        oh, ow = off_mask.shape[1], off_mask.shape[2]
        # Base sampling grid: output pixel -> input pixel (pad=k//2).
        gy = (jnp.arange(oh, dtype=jnp.float32) * self.strides)[:, None]
        gx = (jnp.arange(ow, dtype=jnp.float32) * self.strides)[None, :]
        ky, kx = jnp.meshgrid(jnp.arange(k, dtype=jnp.float32) - k // 2,
                              jnp.arange(k, dtype=jnp.float32) - k // 2,
                              indexing='ij')
        ky, kx = ky.reshape(kk), kx.reshape(kk)

        sample_y = gy[None, :, :, None] + ky + off_y      # (B, oh, ow, KK)
        sample_x = gx[None, :, :, None] + kx + off_x
        loc = jnp.stack([sample_x, sample_y], axis=-1)    # (B,oh,ow,KK,2)

        def one(x_n, loc_n, mask_n):
            taps = bilinear_sample(x_n, loc_n)            # (oh, ow, KK, C)
            taps = taps * mask_n[..., None]
            return jnp.einsum('hwkc,kcf->hwf', taps, kernel,
                              preferred_element_type=jnp.float32)

        out = jax.vmap(one)(x, loc, mask)
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros,
                                   (self.features,))
        return out.astype(x.dtype)

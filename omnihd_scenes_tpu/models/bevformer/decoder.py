"""DETR3D-style decoder with iterative box refinement.

Parity target: ``DetectionTransformerDecoder``
(reference ``bevformer/modules/decoder.py:53-135``): each layer runs
MHA self-attention + ``CustomMSDeformableAttention`` over the flattened
BEV, then (with box refinement) the layer's reg branch adds xy/z offsets
to the inverse-sigmoid reference points, detached between layers.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.bevformer.attention import (
    CustomMSDeformableAttention, MultiheadAttention)
from omnihd_scenes_tpu.models.bevformer.encoder import FFN


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class DecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    num_points: int = 4

    @nn.compact
    def __call__(self, query, query_pos, bev_value, reference_points,
                 bev_spatial_shapes):
        x = MultiheadAttention(self.embed_dims, self.num_heads,
                               name='self_attn')(query, query_pos)
        x = nn.LayerNorm()(x)
        x = CustomMSDeformableAttention(
            self.embed_dims, self.num_heads, 1, self.num_points,
            name='cross_attn')(x, bev_value, reference_points,
                               bev_spatial_shapes, query_pos=query_pos)
        x = nn.LayerNorm()(x)
        x = FFN(self.embed_dims, self.feedforward_channels)(x)
        x = nn.LayerNorm()(x)
        return x


class DetectionTransformerDecoder(nn.Module):
    """num_layers decoder with per-layer reference refinement.

    ``reg_branch_fn(layer_idx, features)`` produces the 10-dim code used
    both for refinement (dims 0:2 xy, 4:5 z) and the final outputs.
    """

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512

    @nn.compact
    def __call__(self, query, query_pos, bev_value, reference_points,
                 bev_spatial_shapes, reg_branch_fn: Callable):
        outputs = []
        refs = [reference_points]
        output = query
        for i in range(self.num_layers):
            ref_input = reference_points[:, None, :2]   # (nq, levels=1, 2)
            output = DecoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                name=f'layer_{i}')(output, query_pos, bev_value, ref_input,
                                   bev_spatial_shapes)
            tmp = reg_branch_fn(i, output)              # (nq, 10)
            new_ref = jnp.concatenate([
                jax.nn.sigmoid(tmp[:, 0:2]
                               + inverse_sigmoid(reference_points[:, 0:2])),
                jax.nn.sigmoid(tmp[:, 4:5]
                               + inverse_sigmoid(reference_points[:, 2:3])),
            ], axis=-1)
            reference_points = jax.lax.stop_gradient(new_ref)
            outputs.append(output)
            refs.append(reference_points)
        # refs[i] is the reference INTO layer i (init + per-layer).
        return jnp.stack(outputs), jnp.stack(refs[:-1])

"""BEVFormerHead: learned BEV/object queries, per-layer branches, loss.

Parity target: ``BEVFormerHead``
(reference ``bevformer/dense_heads/bevformer_head.py:17-685``):
- learned BEV embedding (bev_h x bev_w) + 900 object query embeddings
  (512 = pos ‖ feat);
- learned row/col positional encoding (num_feats=128 each);
- per-decoder-layer cls/reg branches (cloned when box refinement is on);
- reg output = offsets on inverse-sigmoid references -> sigmoid ->
  rescaled to pc_range; 10-dim code (cx, cy, w, l, cz, h, sin, cos,
  vx, vy);
- Hungarian-matched focal + L1 loss over all decoder layers with code
  weights [1x8, 0.2, 0.2]; decode via NMSFreeCoder.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.bbox_coder import (NMSFreeCoderCfg,
                                                 nms_free_decode,
                                                 normalize_bbox)
from omnihd_scenes_tpu.models.bevformer.decoder import inverse_sigmoid
from omnihd_scenes_tpu.models.bevformer.transformer import (
    PerceptionTransformer)
from omnihd_scenes_tpu.models.hungarian import hungarian_match
from omnihd_scenes_tpu.models.losses import sigmoid_focal_loss


class LearnedPositionalEncoding(nn.Module):
    """Row/col learned embeddings -> (h*w, 2*num_feats)."""

    num_feats: int = 128
    row_num_embed: int = 160
    col_num_embed: int = 240

    @nn.compact
    def __call__(self):
        row = self.param('row_embed', nn.initializers.uniform(1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param('col_embed', nn.initializers.uniform(1.0),
                         (self.col_num_embed, self.num_feats))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :],
                             (self.row_num_embed, self.col_num_embed,
                              self.num_feats)),
            jnp.broadcast_to(row[:, None, :],
                             (self.row_num_embed, self.col_num_embed,
                              self.num_feats)),
        ], axis=-1)
        return pos.reshape(-1, 2 * self.num_feats)


class Branches(nn.Module):
    """Per-layer cls/reg MLP branches (cloned for box refinement)."""

    num_layers: int = 6
    num_classes: int = 4
    code_size: int = 10
    embed_dims: int = 256

    def setup(self):
        def make_cls():
            return nn.Sequential([
                nn.Dense(self.embed_dims), nn.LayerNorm(), nn.relu,
                nn.Dense(self.embed_dims), nn.LayerNorm(), nn.relu,
                nn.Dense(self.num_classes)])

        def make_reg():
            return nn.Sequential([
                nn.Dense(self.embed_dims), nn.relu,
                nn.Dense(self.embed_dims), nn.relu,
                nn.Dense(self.code_size)])

        self.cls_branches = [make_cls() for _ in range(self.num_layers)]
        self.reg_branches = [make_reg() for _ in range(self.num_layers)]

    def cls(self, lvl, x):
        return self.cls_branches[lvl](x)

    def reg(self, lvl, x):
        return self.reg_branches[lvl](x)

    def __call__(self, lvl, x):  # default: reg (used by the decoder)
        return self.reg(lvl, x)


class BEVFormerHead(nn.Module):
    """DETR head over the temporal BEV; single-sample forward."""

    bev_h: int = 160
    bev_w: int = 240
    num_query: int = 900
    num_classes: int = 4
    embed_dims: int = 256
    encoder_layers: int = 3
    decoder_layers: int = 6
    num_cams: int = 6
    pc_range: Sequence[float] = (-60, -40, -3.0, 60, 40, 5.0)
    code_size: int = 10
    sca_query_cap: float = 1.0
    tsa_impl: str = 'gather'

    def setup(self):
        self.bev_embedding = self.param(
            'bev_embedding', nn.initializers.normal(1.0),
            (self.bev_h * self.bev_w, self.embed_dims))
        self.query_embedding = self.param(
            'query_embedding', nn.initializers.normal(1.0),
            (self.num_query, 2 * self.embed_dims))
        self.positional_encoding = LearnedPositionalEncoding(
            self.embed_dims // 2, self.bev_h, self.bev_w)
        self.transformer = PerceptionTransformer(
            embed_dims=self.embed_dims, num_cams=self.num_cams,
            encoder_layers=self.encoder_layers,
            decoder_layers=self.decoder_layers,
            bev_h=self.bev_h, bev_w=self.bev_w, pc_range=self.pc_range,
            sca_query_cap=self.sca_query_cap, tsa_impl=self.tsa_impl)
        self.branches = Branches(self.decoder_layers, self.num_classes,
                                 self.code_size, self.embed_dims)

    def get_bev(self, mlvl_feats, can_bus, lidar2img, img_hw,
                prev_bev=None, has_prev=None):
        """Encoder-only path (history replay, ``only_bev=True``)."""
        bev_pos = self.positional_encoding()
        return self.transformer.get_bev_features(
            mlvl_feats, self.bev_embedding, bev_pos, can_bus, lidar2img,
            img_hw, prev_bev=prev_bev, has_prev=has_prev)

    def __call__(self, mlvl_feats, can_bus, lidar2img, img_hw,
                 prev_bev=None, has_prev=None):
        bev_pos = self.positional_encoding()
        bev_embed, hs, refs = self.transformer(
            mlvl_feats, self.bev_embedding, self.query_embedding, bev_pos,
            can_bus, lidar2img, img_hw, self.branches.reg,
            prev_bev=prev_bev, has_prev=has_prev)

        pc = self.pc_range
        all_cls, all_coords = [], []
        for lvl in range(self.decoder_layers):
            ref = inverse_sigmoid(refs[lvl])
            cls_out = self.branches.cls(lvl, hs[lvl])
            tmp = self.branches.reg(lvl, hs[lvl])
            xy = jax.nn.sigmoid(tmp[:, 0:2] + ref[:, 0:2])
            z = jax.nn.sigmoid(tmp[:, 4:5] + ref[:, 2:3])
            coord = jnp.concatenate([
                xy[:, 0:1] * (pc[3] - pc[0]) + pc[0],
                xy[:, 1:2] * (pc[4] - pc[1]) + pc[1],
                tmp[:, 2:4],
                z * (pc[5] - pc[2]) + pc[2],
                tmp[:, 5:10],
            ], axis=-1)
            all_cls.append(cls_out)
            all_coords.append(coord)

        return {
            'bev_embed': bev_embed,
            'all_cls_scores': jnp.stack(all_cls),     # (L, nq, C)
            'all_bbox_preds': jnp.stack(all_coords),  # (L, nq, 10)
        }


class DETRLossCfg(NamedTuple):
    num_classes: int = 4
    cls_weight: float = 2.0
    bbox_weight: float = 0.25
    code_weights: Sequence[float] = (1.0,) * 8 + (0.2, 0.2)


def bevformer_head_loss(all_cls_scores: jnp.ndarray,
                        all_bbox_preds: jnp.ndarray,
                        gt_boxes: jnp.ndarray,
                        gt_labels: jnp.ndarray,
                        gt_mask: jnp.ndarray,
                        cfg: DETRLossCfg = DETRLossCfg()) -> Dict[str, jnp.ndarray]:
    """Hungarian-matched focal + L1 loss over all decoder layers.

    gt_boxes: padded (G, 9) [x, y, z_bottom, w, l, h, yaw, vx, vy].
    """
    gt_codes = normalize_bbox(gt_boxes)            # (G, 10)
    num_layers = all_cls_scores.shape[0]
    code_w = jnp.asarray(cfg.code_weights)

    losses = {}
    total_cls = total_bbox = 0.0
    for lvl in range(num_layers):
        cls_scores = all_cls_scores[lvl]           # (nq, C)
        bbox_preds = all_bbox_preds[lvl]           # (nq, 10)

        matched, pos_mask = hungarian_match(
            cls_scores, bbox_preds, gt_codes, gt_labels, gt_mask,
            cls_weight=cfg.cls_weight, bbox_weight=cfg.bbox_weight)

        nq = cls_scores.shape[0]
        labels = jnp.full((nq,), cfg.num_classes, jnp.int32)
        safe_q = jnp.where(matched >= 0, matched, 0)
        labels = labels.at[safe_q].set(
            jnp.where(gt_mask, gt_labels, cfg.num_classes), mode='drop')

        targets = jnp.zeros((nq, gt_codes.shape[-1]))
        targets = targets.at[safe_q].set(
            jnp.where(gt_mask[:, None], gt_codes, 0.0), mode='drop')

        num_pos = jnp.clip(jnp.sum(pos_mask), 1, None).astype(jnp.float32)

        one_hot = jax.nn.one_hot(labels, cfg.num_classes + 1)[:, :-1]
        cls_loss = jnp.sum(sigmoid_focal_loss(cls_scores, one_hot)) / num_pos

        l1 = jnp.abs(bbox_preds - targets) * code_w
        l1 = jnp.where(jnp.isfinite(targets), l1, 0.0)
        bbox_loss = jnp.sum(l1 * pos_mask[:, None]) / num_pos

        losses[f'd{lvl}.loss_cls'] = cfg.cls_weight * cls_loss
        losses[f'd{lvl}.loss_bbox'] = cfg.bbox_weight * bbox_loss
        total_cls += losses[f'd{lvl}.loss_cls']
        total_bbox += losses[f'd{lvl}.loss_bbox']

    losses['loss_cls'] = losses[f'd{num_layers - 1}.loss_cls']
    losses['loss_bbox'] = losses[f'd{num_layers - 1}.loss_bbox']
    losses['total'] = total_cls + total_bbox
    return losses

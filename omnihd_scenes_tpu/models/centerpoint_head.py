"""CenterPoint-style detection head.

Parity target: ``CenterHeadv1``
(reference ``bevfusion/dense_heads/det_centerpoint_head.py:18-627``) —
per-class heatmaps with Gaussian targets plus dense regression maps
(xy offset, z, log dims, sin/cos yaw, velocity); gaussian-focal heatmap
loss + masked L1 regression; decode = local-max peak picking (the
max-pool NMS trick) + top-k.

Static-shape formulation: targets are built from padded GT arrays with
vectorized Gaussian splatting; decode returns fixed-size padded boxes.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from omnihd_scenes_tpu.models.layers import ConvBNReLU
from omnihd_scenes_tpu.ops.topk import blocked_top_k


class CenterHead(nn.Module):
    """Shared conv trunk + task branches over the BEV map."""

    num_classes: int = 4
    share_channels: int = 64
    head_channels: int = 64

    @nn.compact
    def __call__(self, bev, train: bool = True):
        x = ConvBNReLU(self.share_channels, (3, 3))(bev, train)

        def branch(out_ch, name, bias_init=0.0):
            h = ConvBNReLU(self.head_channels, (3, 3),
                           name=f'{name}_conv')(x, train)
            return nn.Conv(out_ch, (1, 1), name=f'{name}_out',
                           bias_init=nn.initializers.constant(bias_init))(h)

        return {
            'heatmap': branch(self.num_classes, 'heatmap', bias_init=-2.19),
            'reg': branch(2, 'reg'),          # sub-pixel xy offset
            'height': branch(1, 'height'),
            'dim': branch(3, 'dim'),          # log (w, l, h)
            'rot': branch(2, 'rot'),          # (sin, cos)
            'vel': branch(2, 'vel'),
        }


class CenterTargetCfg(NamedTuple):
    pc_range: Sequence[float] = (-60, -40, -3.0, 60, 40, 5.0)
    out_hw: Tuple[int, int] = (160, 240)     # (H=y, W=x)
    min_radius: int = 2
    gaussian_overlap: float = 0.1


def gaussian_radius(l_pix, w_pix, min_overlap: float = 0.1):
    """CenterNet radius (reference ``utils/gaussian.py:62-88``)."""
    height, width = l_pix, w_pix
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0, None))) / 2
    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0, None))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0, None))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def build_center_targets(gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                         gt_mask: jnp.ndarray,
                         cfg: CenterTargetCfg = CenterTargetCfg()):
    """Padded GT -> heatmap + regression targets (one sample).

    Returns dict with 'heatmap' (H, W, C), 'targets' (G, 10), grid
    indices 'gy'/'gx' (G,) and 'valid' (G,).
    """
    h, w = cfg.out_hw
    pc = cfg.pc_range
    sx = (pc[3] - pc[0]) / w
    sy = (pc[4] - pc[1]) / h

    cx = (gt_boxes[:, 0] - pc[0]) / sx
    cy = (gt_boxes[:, 1] - pc[1]) / sy
    in_grid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h) & gt_mask
    gx = jnp.clip(cx.astype(jnp.int32), 0, w - 1)
    gy = jnp.clip(cy.astype(jnp.int32), 0, h - 1)

    l_pix = gt_boxes[:, 4] / sy
    w_pix = gt_boxes[:, 3] / sx
    radius = jnp.clip(gaussian_radius(l_pix, w_pix, cfg.gaussian_overlap),
                      cfg.min_radius, None)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def splat(cyi, cxi, rad, ok):
        g = jnp.exp(-(((ys - cyi) ** 2 + (xs - cxi) ** 2)
                      / (2 * (rad / 3) ** 2)))
        return jnp.where(ok, g, 0.0)

    gaussians = jax.vmap(splat)(cy, cx, radius, in_grid)   # (G, H, W)
    num_classes = int(4)
    onehot = jax.nn.one_hot(gt_labels, num_classes)        # (G, C)
    heatmap = jnp.einsum('ghw,gc->hwc', gaussians, onehot)
    heatmap = jnp.clip(heatmap, 0.0, 1.0)

    targets = jnp.stack([
        cx - gx, cy - gy,                                   # sub-pixel
        gt_boxes[:, 2] + gt_boxes[:, 5] * 0.5,              # gravity z
        jnp.log(jnp.clip(gt_boxes[:, 3], 1e-3, None)),
        jnp.log(jnp.clip(gt_boxes[:, 4], 1e-3, None)),
        jnp.log(jnp.clip(gt_boxes[:, 5], 1e-3, None)),
        jnp.sin(gt_boxes[:, 6]), jnp.cos(gt_boxes[:, 6]),
        gt_boxes[:, 7], gt_boxes[:, 8],
    ], axis=-1)
    return {'heatmap': heatmap, 'targets': targets, 'gy': gy, 'gx': gx,
            'valid': in_grid}


def gaussian_focal_loss(pred_logits: jnp.ndarray, gt: jnp.ndarray,
                        alpha: float = 2.0, gamma: float = 4.0):
    """CenterNet penalty-reduced focal loss, normalized by #peaks."""
    p = jax.nn.sigmoid(pred_logits)
    eps = 1e-6
    pos = (gt >= 1.0 - 1e-4).astype(p.dtype)
    neg_w = (1 - gt) ** gamma
    pos_loss = -jnp.log(p + eps) * (1 - p) ** alpha * pos
    neg_loss = -jnp.log(1 - p + eps) * p ** alpha * neg_w * (1 - pos)
    n_pos = jnp.clip(jnp.sum(pos), 1.0, None)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos


def center_head_loss(preds: Dict[str, jnp.ndarray], gt_boxes, gt_labels,
                     gt_mask, cfg: CenterTargetCfg = CenterTargetCfg(),
                     code_weights=(1.0,) * 8 + (0.2, 0.2)):
    """One-sample CenterPoint loss (heatmap focal + gathered L1 reg)."""
    tgt = build_center_targets(gt_boxes, gt_labels, gt_mask, cfg)
    hm_loss = gaussian_focal_loss(preds['heatmap'], tgt['heatmap'])

    reg_map = jnp.concatenate([preds['reg'], preds['height'], preds['dim'],
                               preds['rot'], preds['vel']], axis=-1)
    picked = reg_map[tgt['gy'], tgt['gx']]                  # (G, 10)
    l1 = jnp.abs(picked - tgt['targets']) * jnp.asarray(code_weights)
    n = jnp.clip(jnp.sum(tgt['valid']), 1, None)
    reg_loss = jnp.sum(l1 * tgt['valid'][:, None]) / n
    return {'loss_heatmap': hm_loss, 'loss_bbox': reg_loss}


def center_head_decode(preds: Dict[str, jnp.ndarray],
                       cfg: CenterTargetCfg = CenterTargetCfg(),
                       max_num: int = 500, score_thr: float = 0.1):
    """Peak-picking decode (3x3 local-max NMS + top-k), one sample."""
    h, w = cfg.out_hw
    pc = cfg.pc_range
    sx = (pc[3] - pc[0]) / w
    sy = (pc[4] - pc[1]) / h

    heat = jax.nn.sigmoid(preds['heatmap'])                 # (H, W, C)
    localmax = nn.max_pool(heat[None], (3, 3), strides=(1, 1),
                           padding='SAME')[0]
    heat = jnp.where(heat >= localmax, heat, 0.0)

    flat = heat.reshape(-1)
    k = min(max_num, flat.shape[0])
    scores, idx = blocked_top_k(flat, k)
    idx = jax.lax.optimization_barrier(idx)
    c = heat.shape[-1]
    cls = (idx % c).astype(jnp.int32)
    pix = idx // c
    gy = pix // w
    gx = pix % w

    reg_map = jnp.concatenate([preds['reg'], preds['height'], preds['dim'],
                               preds['rot'], preds['vel']], axis=-1)
    r = reg_map[gy, gx]                                      # (k, 10)
    x = (gx.astype(jnp.float32) + r[:, 0]) * sx + pc[0]
    y = (gy.astype(jnp.float32) + r[:, 1]) * sy + pc[1]
    dims = jnp.exp(r[:, 3:6])
    yaw = jnp.arctan2(r[:, 6], r[:, 7])
    z_bottom = r[:, 2] - dims[:, 2] * 0.5
    boxes = jnp.stack([x, y, z_bottom, dims[:, 0], dims[:, 1], dims[:, 2],
                       yaw, r[:, 8], r[:, 9]], axis=-1)
    valid = scores > score_thr
    if k < max_num:
        pad = max_num - k
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 9))])
        scores = jnp.concatenate([scores, jnp.zeros((pad,))])
        cls = jnp.concatenate([cls, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return boxes, scores, cls, valid

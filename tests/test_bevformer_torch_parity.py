"""Mini full-graph torch-mirror parity for BEVFormer-T (VERDICT r4
item 1, second half).

Component parity (tests/test_torch_parity.py) pins the ms_deform_attn
op; this pins the ORCHESTRATION — a functional torch/numpy mirror of
the complete temporal forward at mini scale (one encoder layer, one
decoder layer, two cameras, two-frame queue, R50 backbone):

  ResNet50(frozen BN) -> FPN -> [frame 0: encoder without history] ->
  [frame 1: can_bus shift + prev-BEV rotation + TSA over the
  (prev, cur) queue + point-sampled SCA (masked dense) + FFN/LN] ->
  DETR decoder (MHA + deformable cross-attn + reference refinement) ->
  per-layer cls/reg branches -> pc_range-denormalized coords,

with shared randomized weights, asserting the head outputs, plus the
Hungarian-matched focal+L1 loss against an INDEPENDENT
scipy.linear_sum_assignment + numpy reimplementation.

Reference graph being mirrored: ``bevformer/detectors/bevformer.py:
183-205`` (history replay), ``modules/transformer.py:127-197`` (shift /
rotate / can_bus MLP), ``modules/encoder.py:89-151`` (point sampling),
``temporal_self_attention.py:26-278``, ``spatial_cross_attention.py:
31-404``, ``modules/decoder.py:53-135``,
``dense_heads/bevformer_head.py:112-212``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
import torch.nn.functional as F                          # noqa: E402

from omnihd_scenes_tpu.models.bevformer.detector import (  # noqa: E402
    BEVFormerConfig, BEVFormerDetector)
from tests.test_torch_parity import _msda_torch, _t       # noqa: E402

torch.set_num_threads(1)

BEV_H, BEV_W, C, NQ, NCAM = 8, 12, 64, 16, 2
IMG_HW = (64, 96)
PC = (-8.0, -8.0, -3.0, 8.0, 8.0, 5.0)
CFG = BEVFormerConfig(
    bev_h=BEV_H, bev_w=BEV_W, num_query=NQ, embed_dims=C,
    encoder_layers=1, decoder_layers=1, num_cams=NCAM, queue_length=2,
    pc_range=PC, resnet_depth=50, resnet_out_indices=(3,),
    img_hw=IMG_HW, sca_query_cap=1.0)


def _lidar2img():
    """Two plausible pinhole projections (one yawed 90 deg)."""
    k = np.array([[40.0, 0, 48, 0], [0, 40.0, 32, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    flip = np.eye(4, dtype=np.float32)
    # camera 0 looks along +x: (X, Y, Z)_lidar -> (-Y, -Z, X)_cam
    f0 = np.zeros((4, 4), np.float32)
    f0[0, 1], f0[1, 2], f0[2, 0], f0[3, 3] = -1, -1, 1, 1
    # camera 1 looks along +y.
    f1 = np.zeros((4, 4), np.float32)
    f1[0, 0], f1[1, 2], f1[2, 1], f1[3, 3] = 1, -1, 1, 1
    return np.stack([k @ f0, k @ f1])


def _inputs():
    rng = np.random.RandomState(5)
    imgs = rng.randn(2, NCAM, *IMG_HW, 3).astype(np.float32)
    can_bus = np.zeros((2, 18), np.float32)
    can_bus[1, 0], can_bus[1, 1] = 1.2, -0.7      # delta xy (frame 1)
    can_bus[:, -2] = [0.0, 3.0]                   # patch angle (deg)
    can_bus[:, -1] = [0.0, 5.0]                   # rotation angle (deg)
    l2i = np.tile(_lidar2img()[None], (2, 1, 1, 1)).astype(np.float32)
    has_prev = np.array([False, True])
    return imgs, can_bus, l2i, has_prev


def _randomize(variables, seed=9):
    rng = np.random.RandomState(seed)
    paths, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for path, leaf in paths:
        v = rng.normal(0, 0.1, np.shape(leaf)).astype(np.float32)
        if 'var' in jax.tree_util.keystr((path[-1],)):
            v = np.abs(v) + 0.5
        out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope='module')
def shared():
    imgs, can_bus, l2i, has_prev = _inputs()
    model = BEVFormerDetector(CFG)
    variables = model.init(jax.random.PRNGKey(0), imgs, can_bus, l2i,
                           has_prev, train=False)
    variables = jax.tree.map(jnp.asarray, _randomize(variables))
    out = jax.jit(lambda v, *a: model.apply(v, *a, train=False))(
        variables, imgs, can_bus, l2i, has_prev)
    out = {k: np.asarray(v) for k, v in out.items()}
    p = jax.tree.map(np.asarray, variables['params'])
    s = jax.tree.map(np.asarray, variables['batch_stats'])
    return dict(p=p, s=s, out=out, imgs=imgs, can_bus=can_bus, l2i=l2i)


# ---------------------------------------------------------------------------
# torch functional mirror
# ---------------------------------------------------------------------------

def _dense(p, x):
    return x @ _t(p['kernel']) + _t(p['bias'])


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * _t(p['scale']) + _t(p['bias'])


def _ffn(p, x):
    y = F.relu(_dense(p['Dense_0'], x))
    return _dense(p['Dense_1'], y) + x


def _backbone(shared, img):
    """R50 frozen-BN last stage + 1-level FPN, via the fusion test's
    torchvision-style mirror."""
    from tests.test_full_graph_parity import _torch_resnet_from_flax

    net = _torch_resnet_from_flax(
        {'params': shared['p'], 'batch_stats': shared['s']},
        prefix=('img_backbone',))
    with torch.no_grad():
        stages = net(_t(img.transpose(0, 3, 1, 2)))
        feat = stages[-1]                          # stride-32 stage
        pn = shared['p']['img_neck']
        lat = F.conv2d(feat, _t(pn['Conv_0']['kernel']).permute(
            3, 2, 0, 1), bias=_t(pn['Conv_0']['bias']))
        out = F.conv2d(lat, _t(pn['Conv_1']['kernel']).permute(
            3, 2, 0, 1), bias=_t(pn['Conv_1']['bias']), padding=1)
    return out                                     # (NCAM, C, h, w)


def _pos_encoding(p):
    row = _t(p['row_embed'])                       # (H, 32)
    col = _t(p['col_embed'])                       # (W, 32)
    pos = torch.cat([
        col[None, :, :].expand(BEV_H, BEV_W, -1),
        row[:, None, :].expand(BEV_H, BEV_W, -1)], dim=-1)
    return pos.reshape(BEV_H * BEV_W, C)


def _ref_points_3d(num_z=4):
    zr = PC[5] - PC[2]
    zs = np.linspace(0.5, zr - 0.5, num_z) / zr
    xs = np.linspace(0.5, BEV_W - 0.5, BEV_W) / BEV_W
    ys = np.linspace(0.5, BEV_H - 0.5, BEV_H) / BEV_H
    ref = np.zeros((num_z, BEV_H, BEV_W, 3), np.float32)
    ref[..., 0] = xs[None, None, :]
    ref[..., 1] = ys[None, :, None]
    ref[..., 2] = zs[:, None, None]
    return ref.reshape(num_z, -1, 3)


def _ref_points_2d():
    ys, xs = np.meshgrid(np.linspace(0.5, BEV_H - 0.5, BEV_H) / BEV_H,
                         np.linspace(0.5, BEV_W - 0.5, BEV_W) / BEV_W,
                         indexing='ij')
    return np.stack([xs.reshape(-1), ys.reshape(-1)],
                    -1).astype(np.float32)[:, None, :]


def _point_sampling(l2i):
    ref = _ref_points_3d()
    r = np.stack([ref[..., 0] * (PC[3] - PC[0]) + PC[0],
                  ref[..., 1] * (PC[4] - PC[1]) + PC[1],
                  ref[..., 2] * (PC[5] - PC[2]) + PC[2],
                  np.ones_like(ref[..., 0])], -1)
    cam = np.einsum('nij,zqj->nzqi', l2i, r)
    eps = 1e-5
    mask = cam[..., 2] > eps
    uv = cam[..., :2] / np.maximum(cam[..., 2:3], eps)
    u = uv[..., 0] / IMG_HW[1]
    v = uv[..., 1] / IMG_HW[0]
    mask = mask & (u > 0) & (u < 1) & (v > 0) & (v < 1)
    return (np.moveaxis(np.stack([u, v], -1), 1, 2),
            np.moveaxis(mask, 1, 2))               # (cam, nq, z, *)


def _tsa(p, query, pos, value_queue, ref_queue):
    """TemporalSelfAttention mirror (heads=8, points=4, queue=2)."""
    nh, npts = 8, 4
    identity = query
    q = query + pos
    q2 = torch.cat([value_queue[0], q], dim=-1)
    off = _dense(p['sampling_offsets'], q2).reshape(
        BEV_H * BEV_W, nh, 2, 1, npts, 2)
    w = _dense(p['attention_weights'], q2).reshape(
        BEV_H * BEV_W, nh, 2, npts)
    w = torch.softmax(w, dim=-1).reshape(BEV_H * BEV_W, nh, 2, 1, npts)
    off = off.permute(2, 0, 1, 3, 4, 5)            # (queue, nq, h, 1, p, 2)
    w = w.permute(2, 0, 1, 3, 4)
    v = _dense(p['value_proj'], value_queue)       # (queue, nq, C)
    v = v.reshape(2, -1, nh, C // nh)
    norm = torch.tensor([[BEV_W, BEV_H]], dtype=torch.float32)
    loc = ref_queue[:, :, None, :, None, :] + off / norm[None, None, None]
    outs = [_msda_torch(v[i], ((BEV_H, BEV_W),), loc[i], w[i])
            for i in range(2)]
    out = (outs[0] + outs[1]) / 2
    return _dense(p['output_proj'], out) + identity


def _msda3d(p, query, value, ref_cam):
    """MSDeformableAttention3D mirror (heads=8, points=8, z=4)."""
    nh, npts = 8, 8
    nq = query.shape[0]
    off = _dense(p['sampling_offsets'], query).reshape(nq, nh, 1, npts, 2)
    w = torch.softmax(_dense(p['attention_weights'], query).reshape(
        nq, nh, npts), dim=-1).reshape(nq, nh, 1, npts)
    v = _dense(p['value_proj'], value).reshape(-1, nh, C // nh)
    hcam, wcam = CAM_SHAPE
    norm = torch.tensor([[wcam, hcam]], dtype=torch.float32)
    num_z = ref_cam.shape[1]
    off = (off / norm[None, None, :, None]).reshape(
        nq, nh, 1, npts // num_z, num_z, 2)
    loc = ref_cam[:, None, None, None, :, :] + off
    loc = loc.reshape(nq, nh, 1, npts, 2)
    return _msda_torch(v, (CAM_SHAPE,), loc, w)


def _sca(p, query, cam_values, ref_cam, mask):
    identity = query
    hit = torch.from_numpy(mask.any(-1))           # (cam, nq)
    slots = torch.zeros_like(query)
    for n in range(NCAM):
        out = _msda3d(p['deformable_attention'], query, cam_values[n],
                      _t(ref_cam[n]))
        slots = slots + out * hit[n][:, None]
    count = hit.sum(0).clamp(min=1)[:, None]
    slots = slots / count
    return _dense(p['output_proj'], slots) + identity


def _rotate_bev(bev, angle_deg):
    """torchvision-rotate analogue == flax rotate_bev (zero OOB,
    half-pixel centers)."""
    grid = bev.reshape(BEV_H, BEV_W, C)
    cx, cy = (BEV_W - 1) * 0.5, (BEV_H - 1) * 0.5
    ang = -np.float32(angle_deg) * np.pi / 180.0
    cos, sin = np.cos(ang), np.sin(ang)
    ys, xs = np.meshgrid(np.arange(BEV_H, dtype=np.float32),
                         np.arange(BEV_W, dtype=np.float32), indexing='ij')
    sx = cos * (xs - cx) - sin * (ys - cy) + cx
    sy = sin * (xs - cx) + cos * (ys - cy) + cy
    gx = (torch.from_numpy(sx) + 0.5) / BEV_W * 2 - 1
    gy = (torch.from_numpy(sy) + 0.5) / BEV_H * 2 - 1
    g = torch.stack([gx, gy], dim=-1)[None]
    v = grid.permute(2, 0, 1)[None]
    out = F.grid_sample(v, g, mode='bilinear', padding_mode='zeros',
                        align_corners=False)
    return out[0].permute(1, 2, 0).reshape(BEV_H * BEV_W, C)


CAM_SHAPE = (2, 3)     # R50 stride-32 stage of a 64x96 image


def _encode_frame(shared, img, can_bus, l2i, prev_bev, use_prev):
    pt = shared['p']['pts_bbox_head']['transformer']
    feat = _backbone(shared, img)                  # (NCAM, C, h, w)
    hcam, wcam = feat.shape[-2:]
    assert (hcam, wcam) == CAM_SHAPE
    flat = feat.permute(0, 2, 3, 1).reshape(NCAM, -1, C)
    flat = flat + _t(shared['p']['pts_bbox_head']['transformer']
                     ['cams_embeds'])[:, None, :]
    flat = flat + _t(pt['level_embeds'])[0][None, None, :]

    # shift (reference transformer.py:127-151)
    gy = (PC[4] - PC[1]) / BEV_H
    gx = (PC[3] - PC[0]) / BEV_W
    dx, dy = can_bus[0], can_bus[1]
    tl = np.sqrt(dx * dx + dy * dy)
    ta = np.arctan2(dy, dx) / np.pi * 180.0
    ba = (ta - can_bus[-2]) / 180.0 * np.pi
    shift = np.array([tl * np.cos(ba) / gx / BEV_W,
                      tl * np.sin(ba) / gy / BEV_H], np.float32)

    prev = _rotate_bev(prev_bev, can_bus[-1])

    mlp = pt['can_bus_mlp']
    cb = F.relu(_dense(mlp['layers_0'], _t(can_bus)))
    cb = F.relu(_dense(mlp['layers_2'], cb))
    bev_q = _t(shared['p']['pts_bbox_head']['bev_embedding']) + cb[None]
    pos = _pos_encoding(shared['p']['pts_bbox_head']['positional_encoding'])

    ref_cam, mask = _point_sampling(l2i)
    ref_2d = torch.from_numpy(_ref_points_2d())
    shift_ref = ref_2d + torch.from_numpy(shift)[None, None]
    ref_prev = shift_ref if use_prev else ref_2d
    ref_queue = torch.stack([ref_prev, ref_2d])

    lp = shared['p']['pts_bbox_head']['transformer']['encoder']['layer_0']
    out = bev_q
    prev_val = prev if use_prev else out
    vq = torch.stack([prev_val, out])
    x = _tsa(lp['tsa'], out, pos, vq, ref_queue)
    x = _ln(lp['LayerNorm_0'], x)
    x = _sca(lp['sca'], x, flat, ref_cam, mask)
    x = _ln(lp['LayerNorm_1'], x)
    x = _ffn(lp['FFN_0'], x)
    return _ln(lp['LayerNorm_2'], x)


def _branch_reg(p, x):
    y = F.relu(_dense(p['layers_0'], x))
    y = F.relu(_dense(p['layers_2'], y))
    return _dense(p['layers_4'], y)


def _branch_cls(p, x):
    y = F.relu(_ln(p['layers_1'], _dense(p['layers_0'], x)))
    y = F.relu(_ln(p['layers_4'], _dense(p['layers_3'], y)))
    return _dense(p['layers_6'], y)


def _mha(p, query, pos):
    """flax MultiHeadDotProductAttention mirror: q/k get +pos, v does
    not; per-head projections; softmax(q.k/sqrt(hd))."""
    nh = 8
    hd = C // nh
    q_in, kv_in = query + pos, query + pos
    q = torch.einsum('qc,chd->qhd', q_in, _t(p['query']['kernel'])) \
        + _t(p['query']['bias'])
    k = torch.einsum('qc,chd->qhd', kv_in, _t(p['key']['kernel'])) \
        + _t(p['key']['bias'])
    v = torch.einsum('qc,chd->qhd', query, _t(p['value']['kernel'])) \
        + _t(p['value']['bias'])
    logits = torch.einsum('qhd,khd->hqk', q / np.sqrt(hd), k)
    att = torch.softmax(logits, dim=-1)
    o = torch.einsum('hqk,khd->qhd', att, v)
    return torch.einsum('qhd,hdc->qc', o, _t(p['out']['kernel'])) \
        + _t(p['out']['bias'])


def _decoder_cross(p, query, pos, bev_value, ref):
    nh, npts = 8, 4
    nq = query.shape[0]
    identity = query
    q = query + pos
    off = _dense(p['sampling_offsets'], q).reshape(nq, nh, 1, npts, 2)
    w = torch.softmax(_dense(p['attention_weights'], q).reshape(
        nq, nh, npts), dim=-1).reshape(nq, nh, 1, npts)
    v = _dense(p['value_proj'], bev_value).reshape(-1, nh, C // nh)
    norm = torch.tensor([[BEV_W, BEV_H]], dtype=torch.float32)
    loc = ref[:, None, :, None, :] + off / norm[None, None, :, None]
    out = _msda_torch(v, ((BEV_H, BEV_W),), loc, w)
    return _dense(p['output_proj'], out) + identity


def _inv_sigmoid(x, eps=1e-5):
    x = torch.clamp(x, eps, 1 - eps)
    return torch.log(x / (1 - x))


def torch_forward(shared):
    imgs, can_bus, l2i, _ = _inputs()
    ph = shared['p']['pts_bbox_head']

    bev0 = _encode_frame(shared, imgs[0], can_bus[0], l2i[0],
                         torch.zeros(BEV_H * BEV_W, C), use_prev=False)
    bev1 = _encode_frame(shared, imgs[1], can_bus[1], l2i[1],
                         bev0.detach(), use_prev=True)

    qe = _t(ph['query_embedding'])
    query_pos, query = qe[:, :C], qe[:, C:]
    ref = torch.sigmoid(_dense(
        ph['transformer']['reference_points_fc'], query_pos))

    dl = ph['transformer']['decoder']['layer_0']
    x = _mha(dl['self_attn']['MultiHeadDotProductAttention_0'],
             query, query_pos)
    x = x + query                                  # residual in module
    x = _ln(dl['LayerNorm_0'], x)
    x = _decoder_cross(dl['cross_attn'], x, query_pos, bev1,
                       ref[:, None, :2])
    x = _ln(dl['LayerNorm_1'], x)
    x = _ffn(dl['FFN_0'], x)
    hs = _ln(dl['LayerNorm_2'], x)

    br = ph['branches']
    cls_out = _branch_cls(br['cls_branches_0'], hs)
    tmp = _branch_reg(br['reg_branches_0'], hs)
    iref = _inv_sigmoid(ref)
    xy = torch.sigmoid(tmp[:, 0:2] + iref[:, 0:2])
    z = torch.sigmoid(tmp[:, 4:5] + iref[:, 2:3])
    coord = torch.cat([
        xy[:, 0:1] * (PC[3] - PC[0]) + PC[0],
        xy[:, 1:2] * (PC[4] - PC[1]) + PC[1],
        tmp[:, 2:4],
        z * (PC[5] - PC[2]) + PC[2],
        tmp[:, 5:10]], dim=-1)
    return bev1, cls_out, coord


def test_bevformer_full_graph_parity(shared):
    with torch.no_grad():
        bev_t, cls_t, coord_t = torch_forward(shared)
    out = shared['out']
    np.testing.assert_allclose(out['bev_embed'], bev_t.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(out['all_cls_scores'][0], cls_t.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(out['all_bbox_preds'][0], coord_t.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_bevformer_loss_parity(shared):
    """Hungarian-matched DETR loss vs scipy + numpy reimplementation."""
    from scipy.optimize import linear_sum_assignment

    from omnihd_scenes_tpu.models.bevformer.head import (
        DETRLossCfg, bevformer_head_loss)

    rng = np.random.RandomState(13)
    g = 5
    gt_boxes = np.zeros((g, 9), np.float32)
    gt_boxes[:, :2] = rng.uniform(-6, 6, (g, 2))
    gt_boxes[:, 2] = rng.uniform(-1, 0, g)
    gt_boxes[:, 3:6] = rng.uniform(1.0, 4.0, (g, 3))
    gt_boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
    gt_boxes[:, 7:9] = rng.uniform(-2, 2, (g, 2))
    gt_labels = rng.randint(0, 4, g).astype(np.int32)
    gt_mask = np.array([1, 1, 1, 1, 0], bool)

    out = shared['out']
    loss_f = jax.jit(bevformer_head_loss)(
        jnp.asarray(out['all_cls_scores']),
        jnp.asarray(out['all_bbox_preds']),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask))
    loss_f = {k: float(v) for k, v in loss_f.items()}

    # Independent numpy: normalize GT, focal+L1 cost, scipy assignment.
    cx, cy, z, w, l, h, rot, vx, vy = np.split(
        gt_boxes.astype(np.float64), 9, -1)
    gt_codes = np.concatenate([cx, cy, np.log(w), np.log(l),
                               z + h * 0.5, np.log(h), np.sin(rot),
                               np.cos(rot), vx, vy], -1)

    cls = out['all_cls_scores'][0].astype(np.float64)   # (nq, 4)
    box = out['all_bbox_preds'][0].astype(np.float64)   # (nq, 10)
    p = 1 / (1 + np.exp(-cls))
    neg = -np.log(1 - p + 1e-12) * 0.75 * p ** 2
    pos = -np.log(p + 1e-12) * 0.25 * (1 - p) ** 2
    cls_cost = (pos[:, gt_labels] - neg[:, gt_labels]) * 2.0
    l1_cost = np.abs(box[:, None, :8] - gt_codes[None, :, :8]).sum(-1) \
        * 0.25
    cost = cls_cost + l1_cost
    cost[:, ~gt_mask] = 1e9
    row, col = linear_sum_assignment(cost)
    matched = np.full(g, -1)
    matched[col] = row
    matched[~gt_mask] = -1

    nq = cls.shape[0]
    labels = np.full(nq, 4)
    targets = np.zeros((nq, 10))
    pos_mask = np.zeros(nq, bool)
    for gi in range(g):
        if matched[gi] >= 0 and gt_mask[gi]:
            labels[matched[gi]] = gt_labels[gi]
            targets[matched[gi]] = gt_codes[gi]
            pos_mask[matched[gi]] = True
    num_pos = max(pos_mask.sum(), 1)

    one_hot = np.eye(5)[labels][:, :4]
    ce = np.logaddexp(0, cls) - cls * one_hot
    p_t = p * one_hot + (1 - p) * (1 - one_hot)
    a_t = 0.25 * one_hot + 0.75 * (1 - one_hot)
    cls_loss = 2.0 * (a_t * (1 - p_t) ** 2 * ce).sum() / num_pos

    code_w = np.array([1.0] * 8 + [0.2, 0.2])
    l1 = np.abs(box - targets) * code_w
    bbox_loss = 0.25 * (l1 * pos_mask[:, None]).sum() / num_pos

    assert np.isclose(loss_f['loss_cls'], cls_loss, rtol=1e-3,
                      atol=1e-5), (loss_f['loss_cls'], cls_loss)
    assert np.isclose(loss_f['loss_bbox'], bbox_loss, rtol=1e-3,
                      atol=1e-5), (loss_f['loss_bbox'], bbox_loss)

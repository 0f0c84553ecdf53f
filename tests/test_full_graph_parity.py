"""FULL-GRAPH torch-mirror parity for the flagship BEVFusion (VERDICT
r4 item 1).

Component-wise torch parity (tests/test_torch_parity.py) pins DepthNet
and ms_deform_attn; this pins the COMPLETE flagship forward — a plain
PyTorch mirror of

  ResNet50(frozen BN) -> FPNC -> DepthNet -> LSS (scatter mode) ->
  radar pillars (voxelize -> PFN -> scatter) -> SECOND -> SECONDFPN ->
  concat + reduce conv + SE -> Anchor3DHead -> decode-to-boxes

with SHARED weights (flax init randomized, exported flax -> torch), at
reduced spatial scale but PRODUCTION channel widths (R50 2048-ch
trunk, FPNC 256, camC 64, lic 384, SECOND 64/128/256), asserting fp32
agreement end-to-end through decoded boxes and through ONE
training-loss value (anchor focal + smooth-L1 + dir-CE with MaxIoU /
nearest-BEV-IoU assignment, + the KLD depth-distribution loss).

Reference graph being mirrored:
``bevfusion/detectors/bevf_faster_rcnn.py:16-236`` +
``cam_stream_lss_bevpoolv2_depthnet.py:152-608``.

The ResNet weights flow through ``train/torch_import.resnet_name_map``
run in REVERSE (flax tree -> torchvision-style state_dict), so the
staged-pretraining import mapping is pinned in both directions.

Deliberate test choices:
* voxel buffers are shared between frameworks (ops/voxelize.py has its
  own unit tests); an independent set-level cross-check below confirms
  the buffers contain exactly the per-cell point sets.
* the pre-NMS decode compares box values at the flax-selected top-k
  indices plus the sorted top-k score vectors, so blocked_top_k vs
  torch.topk tie ORDER cannot flake the test.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                                   # noqa: E402
import torch.nn.functional as F                          # noqa: E402

from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,       # noqa: E402
                                                BEVFusionConfig,
                                                depth_dist_loss)
from omnihd_scenes_tpu.models.detectors import PointPillarsConfig  # noqa: E402
from omnihd_scenes_tpu.models.lss import LSSConfig               # noqa: E402
from omnihd_scenes_tpu.ops.voxelize import voxelize              # noqa: E402
from tests.test_torch_parity import (TorchDepthNetMirror,        # noqa: E402
                                     _conv_w, _copy_depthnet_params,
                                     _load_bn, _t)

torch.set_num_threads(1)
torch.manual_seed(0)

# ---------------------------------------------------------------------------
# Mini config: production channel widths, reduced spatial extents.
# ---------------------------------------------------------------------------

IMG_HW = (64, 112)
PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 5.0)

LSS_CFG = LSSConfig(
    final_dim=IMG_HW, downsample=4,
    camera_depth_range=(1.0, 9.0, 1.0),          # 8 depth bins
    pc_range=PC_RANGE, grid=2.0,                 # nx=ny=8, nz=4
    inputC=256, camC=64, outC=256,
    splat_mode='scatter')                        # reference-exact splat

PILLAR_CFG = PointPillarsConfig(
    point_cloud_range=PC_RANGE, voxel_size=(1.0, 1.0, 8.0),
    max_voxels=512, max_points_per_voxel=16, bev_hw=(16, 16),
    pfn_channels=(64,), second_channels=(64, 128, 256),
    fpn_channels=(128, 128, 128), num_classes=4,
    anchor_ranges=tuple(
        (-8.0, -8.0, z, 8.0, 8.0, z)
        for z in (0.91, 1.142, 0.906, 1.516)))

FUSION_CFG = BEVFusionConfig(
    imc=256, lic=384, resnet_depth=50, resnet_out_indices=(1, 2, 3),
    frozen_backbone_bn=True, use_depthnet=True,
    lss=LSS_CFG, pillars=PILLAR_CFG)

N_PTS = 512
B = 1


def _inputs():
    rng = np.random.RandomState(7)
    pts = rng.uniform(-7, 7, (B, N_PTS, 8)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 4, (B, N_PTS))
    mask = np.ones((B, N_PTS), bool)
    mask[:, -37:] = False                         # exercise padding
    imgs = rng.randn(B, 6, *IMG_HW, 3).astype(np.float32)
    # Surround rig: cameras looking outward with a forward offset.
    rots, trans = [], []
    for n in range(6):
        yaw = n * np.pi / 3
        c, s = np.cos(yaw), np.sin(yaw)
        r_yaw = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        # img->lidar: (u*d, v*d, d) -> lidar.  Use a plausible K^-1-like
        # scale so frustum points land inside the grid.
        kinv = np.array([[1 / 30.0, 0, -IMG_HW[1] / 60.0],
                         [0, 1 / 30.0, -IMG_HW[0] / 60.0],
                         [0, 0, 1.0]], np.float32)
        flip = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
        rots.append(r_yaw @ flip @ kinv)
        trans.append((r_yaw @ np.array([1.0, 0, 0.5], np.float32)))
    rots = np.tile(np.stack(rots)[None], (B, 1, 1, 1)).astype(np.float32)
    trans = np.tile(np.stack(trans)[None], (B, 1, 1)).astype(np.float32)
    return pts, mask, imgs, rots, trans


def _randomize(variables, seed=3):
    """Random params AND batch stats so BNs actually transform."""
    rng = np.random.RandomState(seed)
    paths, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for path, leaf in paths:
        v = rng.normal(0, 0.05, np.shape(leaf)).astype(np.float32)
        if 'var' in jax.tree_util.keystr((path[-1],)):
            v = np.abs(v) + 0.5          # BN variances stay positive
        out.append(v)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope='module')
def shared():
    pts, mask, imgs, rots, trans = _inputs()
    model = BEVFusion(FUSION_CFG)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, imgs, rots,
                           trans, train=False)
    variables = jax.tree.map(jnp.asarray, _randomize(variables))
    out = jax.jit(lambda v, *a: model.apply(v, *a, train=False))(
        variables, pts, mask, imgs, rots, trans)
    out = {k: (np.asarray(v) if v is not None else None)
           for k, v in out.items()}
    return dict(model=model, variables=variables, out=out, pts=pts,
                mask=mask, imgs=imgs, rots=rots, trans=trans)


# ---------------------------------------------------------------------------
# Torch mirrors
# ---------------------------------------------------------------------------

class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4, eps=1e-5)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4, eps=1e-5))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idn)


class TorchResNet50(tnn.Module):
    """torchvision-style naming so resnet_name_map drives the load."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin, blocks = 64, (3, 4, 6, 3)
        for s, n in enumerate(blocks):
            planes = 64 * (2 ** s)
            layers = []
            for j in range(n):
                layers.append(TorchBottleneck(
                    cin, planes, stride=(2 if s > 0 and j == 0 else 1)))
                cin = planes * 4
            setattr(self, f'layer{s + 1}', tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in range(4):
            x = getattr(self, f'layer{s + 1}')(x)
            outs.append(x)
        return [outs[i] for i in (1, 2, 3)]


def _torch_resnet_from_flax(variables, prefix=('ResNet_0',)):
    """resnet_name_map run in REVERSE: flax tree -> torch state_dict."""
    from omnihd_scenes_tpu.train.torch_import import resnet_name_map

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    sd = {}
    for tkey, (coll, *fpath) in resnet_name_map(50).items():
        v = get(variables[coll], prefix + tuple(fpath))
        if v.ndim == 4:                         # HWIO -> OIHW
            v = v.transpose(3, 2, 0, 1)
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(v))
    net = TorchResNet50()
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all('num_batches' in m for m in missing), missing
    net.eval()
    return net


def _resize(x, hw):
    if x.shape[-2:] == tuple(hw):
        return x
    return F.interpolate(x, size=tuple(hw), mode='bilinear',
                         align_corners=False)


class TorchFPNC(tnn.Module):
    def __init__(self, in_chs, out_ch, outc, target_hw):
        super().__init__()
        self.lat = tnn.ModuleList(
            [tnn.Conv2d(c, out_ch, 1) for c in in_chs])
        self.out = tnn.ModuleList(
            [tnn.Conv2d(out_ch, out_ch, 3, padding=1) for _ in in_chs])
        self.reduce = tnn.Conv2d(out_ch * len(in_chs), outc, 3,
                                 padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(outc, eps=1e-5)
        self.target_hw = target_hw

    def forward(self, feats):
        lats = [l(f) for l, f in zip(self.lat, feats)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + _resize(lats[i],
                                                lats[i - 1].shape[-2:])
        outs = [o(l) for o, l in zip(self.out, lats)]
        x = torch.cat([_resize(o, self.target_hw) for o in outs], dim=1)
        return F.relu(self.bn(self.reduce(x)))


def _load_fpnc(mirror, p, s):
    fpn_p = p['FPN_0']
    for i in range(3):
        mirror.lat[i].weight = _conv_w(fpn_p[f'Conv_{i}']['kernel'])
        mirror.lat[i].bias = tnn.Parameter(_t(fpn_p[f'Conv_{i}']['bias']))
        mirror.out[i].weight = _conv_w(fpn_p[f'Conv_{i + 3}']['kernel'])
        mirror.out[i].bias = tnn.Parameter(
            _t(fpn_p[f'Conv_{i + 3}']['bias']))
    mirror.reduce.weight = _conv_w(p['Conv_0']['kernel'])
    _load_bn(mirror.bn, p['BatchNorm_0'], s['BatchNorm_0'])
    mirror.eval()


class TorchConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, relu=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)
        self.relu = relu

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.relu else x


def _load_cbr(mirror, p, s):
    mirror.conv.weight = _conv_w(p['Conv_0']['kernel'])
    _load_bn(mirror.bn, p['BatchNorm_0'], s['BatchNorm_0'])


# ---------------------------------------------------------------------------
# Stage-by-stage parity
# ---------------------------------------------------------------------------

def _flax_sub(shared, name):
    v = shared['variables']
    return {'params': v['params'][name],
            'batch_stats': v['batch_stats'].get(name, {})}


def test_resnet_stage_parity(shared):
    from omnihd_scenes_tpu.models.resnet import ResNet

    v = _flax_sub(shared, 'ResNet_0')
    imgs = shared['imgs']
    flat = imgs.reshape((-1,) + imgs.shape[2:])
    flax_stages = ResNet(depth=50, out_indices=(1, 2, 3),
                         frozen_bn=True).apply(v, flat, train=False)
    net = _torch_resnet_from_flax(shared['variables'])
    with torch.no_grad():
        t_stages = net(_t(flat.transpose(0, 3, 1, 2)))
    for fs, ts in zip(flax_stages, t_stages):
        np.testing.assert_allclose(
            np.asarray(fs), ts.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4)


def _torch_camera_trunk(shared):
    """ResNet -> FPNC -> DepthNet in torch; returns (ctx, depth)."""
    p = shared['variables']['params']
    s = shared['variables']['batch_stats']
    imgs = shared['imgs']
    flat = _t(imgs.reshape((-1,) + imgs.shape[2:]).transpose(0, 3, 1, 2))

    net = _torch_resnet_from_flax(shared['variables'])
    fpnc = TorchFPNC((512, 1024, 2048), 256, FUSION_CFG.imc,
                     (IMG_HW[0] // 4, IMG_HW[1] // 4))
    _load_fpnc(fpnc, p['FPNC_0'], s['FPNC_0'])
    dnet = TorchDepthNetMirror(FUSION_CFG.imc, FUSION_CFG.imc,
                               LSS_CFG.camC, LSS_CFG.depth_bins)
    _copy_depthnet_params(dnet, {
        'params': p['LiftSplatShoot_0']['DepthNet_0'],
        'batch_stats': s['LiftSplatShoot_0']['DepthNet_0']})
    dnet.eval()
    with torch.no_grad():
        feat = fpnc(net(flat))
        ctx, dlogits = dnet(feat)
    return ctx, torch.softmax(dlogits, dim=1), dlogits


def test_camera_trunk_parity(shared):
    """flax depth/ctx vs the torch ResNet->FPNC->DepthNet chain."""
    ctx_t, depth_t, _ = _torch_camera_trunk(shared)
    # flax depth comes out of the full model forward.
    depth_f = shared['out']['depth']                 # (B, N, fh, fw, D)
    np.testing.assert_allclose(
        depth_f.reshape(depth_t.shape[0], *depth_f.shape[2:]),
        depth_t.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


def _torch_lss_scatter(ctx, depth, rots, trans):
    """Frustum projection + scatter-add splat + BevEncoderConvs mirror
    inputs; returns the (nz*ny*nx, camC) pooled table per sample."""
    nx, ny, nz = LSS_CFG.bev_nx
    frustum = torch.from_numpy(LSS_CFG.frustum())    # (D, fh, fw, 3)
    n_cells = nx * ny * nz
    pts = torch.cat([frustum[..., :2] * frustum[..., 2:3],
                     frustum[..., 2:3]], dim=-1)
    r = torch.from_numpy(rots[0])                    # (N, 3, 3)
    t = torch.from_numpy(trans[0])
    geo = torch.einsum('nij,dhwj->ndhwi', r, pts) + t[:, None, None, None]
    cx = torch.floor((geo[..., 0] - PC_RANGE[0]) / LSS_CFG.grid).long()
    cy = torch.floor((geo[..., 1] - PC_RANGE[1]) / LSS_CFG.grid).long()
    cz = torch.floor((geo[..., 2] - PC_RANGE[2]) / LSS_CFG.grid).long()
    ok = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
          & (cz >= 0) & (cz < nz))
    ids = (cz * ny + cy) * nx + cx
    ids = torch.where(ok, ids, torch.full_like(ids, n_cells))

    # depth (6, D, fh, fw) * ctx (6, C, fh, fw) -> updates
    d = depth[:, :, None]                            # (N, D, 1, fh, fw)
    c = ctx[:, None]                                 # (N, 1, C, fh, fw)
    upd = (d * c).permute(0, 1, 3, 4, 2).reshape(-1, ctx.shape[1])
    acc = torch.zeros(n_cells + 1, ctx.shape[1])
    acc.index_add_(0, ids.reshape(-1), upd)
    return acc[:n_cells]


def test_fused_bev_and_head_parity(shared):
    """The headline: camera splat + radar pillars + fusion + head, all
    in torch, against the flax full-model outputs."""
    p = shared['variables']['params']
    s = shared['variables']['batch_stats']
    nx, ny, nz = LSS_CFG.bev_nx

    # --- camera stream ---
    ctx_t, depth_t, _ = _torch_camera_trunk(shared)
    pooled = _torch_lss_scatter(ctx_t, depth_t, shared['rots'],
                                shared['trans'])
    vox = pooled.reshape(nz, ny, nx, LSS_CFG.camC)
    bev_in = vox.permute(1, 2, 0, 3).reshape(ny, nx, nz * LSS_CFG.camC)
    bev_in = bev_in.permute(2, 0, 1)[None]          # NCHW

    lssp = p['LiftSplatShoot_0']['BevEncoderConvs_0']
    lsss = s['LiftSplatShoot_0']['BevEncoderConvs_0']
    cz = nz * LSS_CFG.camC
    chs = [cz, cz, 512, 512, LSS_CFG.outC]
    x = bev_in
    mirrors = []
    for i in range(4):
        m = TorchConvBNReLU(chs[i], chs[i + 1])
        _load_cbr(m, lssp[f'ConvBNReLU_{i}'], lsss[f'ConvBNReLU_{i}'])
        m.eval()
        mirrors.append(m)
    with torch.no_grad():
        for m in mirrors:
            x = m(x)
    cam_bev = x                                      # (1, 256, ny, nx)

    # cam_bev (8x8) resized to the pillar head grid (8x8): identity
    # here by construction (LSS grid = 2 * pillar voxel, SECOND /2).

    # --- radar stream: shared voxel buffers + torch PFN mirror ---
    pts, mask = shared['pts'], shared['mask']
    vox_j = voxelize(jnp.asarray(pts[0]), jnp.asarray(mask[0]),
                     PILLAR_CFG.point_cloud_range, PILLAR_CFG.voxel_size,
                     PILLAR_CFG.max_voxels, PILLAR_CFG.max_points_per_voxel)
    feats = np.asarray(vox_j.features)
    npts = np.asarray(vox_j.num_points)
    coords = np.asarray(vox_j.coords)
    valid = np.asarray(vox_j.valid)

    # Independent set-level cross-check of the voxel buffers.
    occupied = {}
    for i in range(N_PTS):
        if not mask[0, i]:
            continue
        x_, y_, z_ = pts[0, i, :3]
        if not (PC_RANGE[0] <= x_ < PC_RANGE[3]
                and PC_RANGE[1] <= y_ < PC_RANGE[4]
                and PC_RANGE[2] <= z_ < PC_RANGE[5]):
            continue
        cell = (int((y_ - PC_RANGE[1]) // 1.0), int((x_ - PC_RANGE[0]) // 1.0))
        occupied.setdefault(cell, []).append(i)
    assert int(valid.sum()) == len(occupied)
    by_cell = {tuple(coords[v]): v for v in range(len(valid)) if valid[v]}
    for cell, idxs in occupied.items():
        v = by_cell[cell]
        assert npts[v] == min(len(idxs), PILLAR_CFG.max_points_per_voxel)
        got = {tuple(np.round(feats[v, k], 4)) for k in range(npts[v])}
        want = {tuple(np.round(pts[0, i], 4)) for i in idxs}
        if len(idxs) <= PILLAR_CFG.max_points_per_voxel:
            assert got == want, cell

    # torch PFN: augment -> Linear -> BN -> ReLU -> masked max.
    denom = np.clip(npts, 1, None).astype(np.float32)[:, None, None]
    mean_xyz = feats[..., :3].sum(1, keepdims=True) / denom
    f_cluster = feats[..., :3] - mean_xyz
    vx, vy = PILLAR_CFG.voxel_size[:2]
    cx = coords[:, 1:2].astype(np.float32) * vx + (vx / 2 + PC_RANGE[0])
    cy = coords[:, 0:1].astype(np.float32) * vy + (vy / 2 + PC_RANGE[1])
    f_center = np.stack([feats[..., 0] - cx, feats[..., 1] - cy], -1)
    aug = np.concatenate([feats, f_cluster, f_center], -1)
    slot = np.arange(aug.shape[1])[None, :, None]
    aug = np.where(slot < npts[:, None, None], aug, 0.0).astype(np.float32)

    pfn_p = p['PillarFeatureNet_0']['PFNLayer_0']
    pfn_s = s['PillarFeatureNet_0']['PFNLayer_0']
    w = _t(pfn_p['Dense_0']['kernel'])               # (Din, 64)
    xbn = torch.from_numpy(aug) @ w
    bn_p, bn_s = pfn_p['BatchNorm_0'], pfn_s['BatchNorm_0']
    xbn = ((xbn - _t(bn_s['mean'])) / torch.sqrt(_t(bn_s['var']) + 1e-3)
           * _t(bn_p['scale']) + _t(bn_p['bias']))
    xbn = F.relu(xbn)
    big_neg = torch.tensor(-np.inf)
    xbn = torch.where(torch.from_numpy(slot < npts[:, None, None]),
                      xbn, big_neg)
    pooled_p = xbn.max(dim=1).values
    pooled_p = torch.where(torch.from_numpy(npts[:, None] > 0), pooled_p,
                           torch.tensor(0.0))
    pooled_p = torch.where(torch.from_numpy(valid[:, None]), pooled_p,
                           torch.tensor(0.0))

    h, wdt = PILLAR_CFG.bev_hw
    canvas = torch.zeros(h * wdt, 64)
    lin = torch.from_numpy((coords[:, 0] * wdt + coords[:, 1]).astype(
        np.int64))
    lin = torch.where(torch.from_numpy(valid), lin,
                      torch.full_like(lin, 0))
    src = torch.where(torch.from_numpy(valid[:, None]), pooled_p,
                      torch.zeros_like(pooled_p))
    canvas.index_add_(0, lin, src)
    canvas = canvas.reshape(h, wdt, 64).permute(2, 0, 1)[None]

    # --- SECOND + SECONDFPN mirrors ---
    sp, ss = p['SECOND_0'], s['SECOND_0']
    x = canvas
    outs = []
    li = 0
    cin = 64
    with torch.no_grad():
        for stage, (n, ch) in enumerate(zip((3, 5, 5), (64, 128, 256))):
            m = TorchConvBNReLU(cin, ch, stride=2)
            _load_cbr(m, sp[f'ConvBNReLU_{li}'], ss[f'ConvBNReLU_{li}'])
            m.eval(); li += 1
            x = m(x)
            for _ in range(n):
                m = TorchConvBNReLU(ch, ch)
                _load_cbr(m, sp[f'ConvBNReLU_{li}'],
                          ss[f'ConvBNReLU_{li}'])
                m.eval(); li += 1
                x = m(x)
            outs.append(x)
            cin = ch

        fp, fs = p['SECONDFPN_0'], s['SECONDFPN_0']
        ups = []
        for i, (stride, ch) in enumerate(zip((1, 2, 4), (128, 128, 128))):
            dp = fp[f'DeconvBNReLU_{i}']
            ds = fs[f'DeconvBNReLU_{i}']
            k = _t(dp['ConvTranspose_0']['kernel'])  # (kh, kw, in, out)
            y = F.conv_transpose2d(
                outs[i], k.permute(2, 3, 0, 1), stride=stride)
            bn_p, bn_s = dp['BatchNorm_0'], ds['BatchNorm_0']
            y = ((y - _t(bn_s['mean'])[None, :, None, None])
                 / torch.sqrt(_t(bn_s['var'])[None, :, None, None] + 1e-3)
                 * _t(bn_p['scale'])[None, :, None, None]
                 + _t(bn_p['bias'])[None, :, None, None])
            ups.append(F.relu(y))
        pts_bev = torch.cat(ups, dim=1)              # (1, 384, 8, 8)

        # --- fusion: concat + reduce conv + SE gate ---
        fused = torch.cat([cam_bev, pts_bev], dim=1)
        m = TorchConvBNReLU(fused.shape[1], FUSION_CFG.lic)
        _load_cbr(m, p['ConvBNReLU_0'], s['ConvBNReLU_0'])
        m.eval()
        fused = m(fused)
        sep = p['SEBlock_0']['Conv_0']
        wgt = fused.mean(dim=(2, 3), keepdim=True)
        wgt = F.conv2d(wgt, _conv_w(sep['kernel']),
                       bias=_t(sep['bias']))
        fused = fused * torch.sigmoid(wgt)

        # --- anchor head 1x1 convs ---
        hp = p['Anchor3DHead_0']
        cls_t = F.conv2d(fused, _conv_w(hp['Conv_0']['kernel']),
                         bias=_t(hp['Conv_0']['bias']))
        box_t = F.conv2d(fused, _conv_w(hp['Conv_1']['kernel']),
                         bias=_t(hp['Conv_1']['bias']))
        dir_t = F.conv2d(fused, _conv_w(hp['Conv_2']['kernel']),
                         bias=_t(hp['Conv_2']['bias']))

    out = shared['out']
    np.testing.assert_allclose(
        out['bev'][0], fused[0].numpy().transpose(1, 2, 0),
        rtol=1e-3, atol=1e-3)
    for name, f_val, t_val in (('cls', out['cls_score'], cls_t),
                               ('box', out['bbox_pred'], box_t),
                               ('dir', out['dir_pred'], dir_t)):
        np.testing.assert_allclose(
            f_val[0], t_val[0].numpy().transpose(1, 2, 0),
            rtol=1e-3, atol=1e-3, err_msg=name)

    # Stash for the decode/loss tests.
    shared['torch_head'] = (cls_t[0].numpy().transpose(1, 2, 0),
                            box_t[0].numpy().transpose(1, 2, 0),
                            dir_t[0].numpy().transpose(1, 2, 0))


def test_decoded_boxes_parity(shared):
    """Decode-to-boxes parity over ALL anchors.

    With shared random weights many anchors carry genuinely tied
    scores, so any top-k comparison is tie-order flaky; instead the
    decode runs with nms_pre == A (a permutation of every anchor) and
    the two frameworks' (box, score) row sets are compared by
    nearest-row matching — order-insensitive, still 1e-3 tight."""
    if 'torch_head' not in shared:
        test_fused_bev_and_head_parity(shared)
    from omnihd_scenes_tpu.models.anchor_head import (
        DecodeCfg, anchor_head_decode_candidates)

    anchors = PILLAR_CFG.anchors()                   # (H, W, A, 9)
    a_total = anchors.size // anchors.shape[-1]
    out = shared['out']
    cfg = DecodeCfg(nms_pre=a_total, max_num=a_total)
    boxes_f, scores_f = jax.jit(
        lambda *a: anchor_head_decode_candidates(*a, cfg=cfg))(
        out['cls_score'][0], out['bbox_pred'][0], out['dir_pred'][0],
        jnp.asarray(anchors))
    rows_f = np.concatenate([np.asarray(boxes_f), np.asarray(scores_f)],
                            axis=-1)

    cls_t, box_t, dir_t = shared['torch_head']
    code = anchors.shape[-1]
    an = anchors.reshape(-1, code)
    lg = cls_t.reshape(-1, 4)
    bbs = box_t.reshape(-1, code)
    dps = dir_t.reshape(-1, 2)

    za = an[:, 2] + an[:, 5] / 2
    diag = np.sqrt(an[:, 3] ** 2 + an[:, 4] ** 2)
    xg = bbs[:, 0] * diag + an[:, 0]
    yg = bbs[:, 1] * diag + an[:, 1]
    zg = bbs[:, 2] * an[:, 5] + za
    wg = np.exp(bbs[:, 3]) * an[:, 3]
    lgn = np.exp(bbs[:, 4]) * an[:, 4]
    hg = np.exp(bbs[:, 5]) * an[:, 5]
    rg = bbs[:, 6] + an[:, 6]
    zg = zg - hg / 2
    vxg = bbs[:, 7] * diag + an[:, 7]
    vyg = bbs[:, 8] * diag + an[:, 8]
    dir_bin = dps.argmax(-1)
    off = 0.7854
    dir_rot = (rg - off) - np.floor((rg - off) / np.pi) * np.pi
    yaw = dir_rot + off + np.pi * dir_bin
    boxes_t = np.stack([xg, yg, zg, wg, lgn, hg, yaw, vxg, vyg], -1)
    rows_t = np.concatenate([boxes_t, 1 / (1 + np.exp(-lg))], axis=-1)

    assert rows_f.shape == rows_t.shape == (a_total, 13)
    # Nearest-row matching normalized by the DECODE GAIN: the head
    # outputs agree to 1e-3 (asserted above), and decode multiplies the
    # x/y/vx/vy deltas by the anchor diagonal (<= 8.6 here) and z by
    # the anchor height, so "box agreement at the 1e-3 level" means
    # |diff| / gain < 1e-3 per column.  Both directions (multisets).
    diag_max = float(diag.max())
    h_max = float(an[:, 5].max())
    gain = np.array([diag_max, diag_max, h_max,
                     float(wg.max()), float(lgn.max()), float(hg.max()),
                     1.0, diag_max, diag_max] + [1.0] * 4)
    d = (np.abs(rows_f[:, None, :] - rows_t[None, :, :])
         / np.maximum(gain, 1.0)).max(-1)
    assert float(d.min(1).max()) < 1e-3, float(d.min(1).max())
    assert float(d.min(0).max()) < 1e-3, float(d.min(0).max())


def test_training_loss_parity(shared):
    """ONE training-loss value: anchor focal + smooth-L1(sin-diff) +
    dir-CE with nearest-BEV-IoU MaxIoU assignment, + KLD depth loss —
    flax pipeline vs an independent numpy/torch reimplementation on
    the torch mirror's head outputs."""
    if 'torch_head' not in shared:
        test_fused_bev_and_head_parity(shared)
    from omnihd_scenes_tpu.models.anchor_head import (HeadLossConfig,
                                                      anchor_head_loss)

    rng = np.random.RandomState(11)
    g = 6
    gt_boxes = np.zeros((g, 9), np.float32)
    gt_boxes[:, :2] = rng.uniform(-6, 6, (g, 2))
    gt_boxes[:, 2] = rng.uniform(-1, 0, g)
    gt_boxes[:, 3:6] = rng.uniform(1.2, 4.0, (g, 3))
    gt_boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
    gt_labels = rng.randint(0, 4, g).astype(np.int32)
    gt_mask = np.array([1, 1, 1, 1, 1, 0], bool)

    anchors = PILLAR_CFG.anchors()
    out = shared['out']
    loss_f = jax.jit(lambda *a: anchor_head_loss(
        *a, cfg=HeadLossConfig()))(
        jnp.asarray(out['cls_score'][0]), jnp.asarray(out['bbox_pred'][0]),
        jnp.asarray(out['dir_pred'][0]), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask))
    loss_f = {k: float(v) for k, v in loss_f.items()}

    # ---- independent numpy mirror on the TORCH head outputs ----
    cls_t, box_t, dir_t = shared['torch_head']
    a_flat = anchors.reshape(-1, 9).astype(np.float64)
    A = len(a_flat)
    cls_np = cls_t.reshape(A, 4).astype(np.float64)
    box_np = box_t.reshape(A, 9).astype(np.float64)
    dir_np = dir_t.reshape(A, 2).astype(np.float64)

    def nearest_bev(b):
        rot = b[:, 6] - np.floor(b[:, 6] / np.pi + 0.5) * np.pi
        swap = np.abs(rot) > np.pi / 4
        dx = np.where(swap, b[:, 4], b[:, 3])
        dy = np.where(swap, b[:, 3], b[:, 4])
        return np.stack([b[:, 0] - dx / 2, b[:, 1] - dy / 2,
                         b[:, 0] + dx / 2, b[:, 1] + dy / 2], -1)

    gb = nearest_bev(gt_boxes.astype(np.float64))
    ab = nearest_bev(a_flat)
    lt = np.maximum(gb[:, None, :2], ab[None, :, :2])
    rb = np.minimum(gb[:, None, 2:], ab[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_g = ((gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]))[:, None]
    area_a = ((ab[:, 2] - ab[:, 0]) * (ab[:, 3] - ab[:, 1]))[None]
    iou = inter / np.clip(area_g + area_a - inter, 1e-6, None)
    iou = np.where(gt_mask[:, None], iou, -1.0)

    amax, aarg = iou.max(0), iou.argmax(0)
    state = np.where(amax >= 0.6, 0, np.where(amax < 0.3, 1, 2))
    gmax = iou.max(1)
    claims = (iou == gmax[:, None]) & (gmax[:, None] >= 0.3) \
        & gt_mask[:, None]
    claimed = claims.any(0)
    claim_gt = np.where(claims, np.arange(g)[:, None], -1).max(0)
    assigned = np.where(claimed, claim_gt,
                        np.where(state == 0, aarg, 0))
    is_pos = claimed | (state == 0)
    is_neg = (state == 1) & ~claimed
    lw = (is_pos | is_neg).astype(np.float64)
    labels = np.where(is_pos, gt_labels[assigned], 4)
    num_pos = max(float(is_pos.sum()), 1.0)

    matched = gt_boxes.astype(np.float64)[assigned]
    za = a_flat[:, 2] + a_flat[:, 5] / 2
    zgm = matched[:, 2] + matched[:, 5] / 2
    diag = np.sqrt(a_flat[:, 4] ** 2 + a_flat[:, 3] ** 2)
    tgt = np.stack([
        (matched[:, 0] - a_flat[:, 0]) / diag,
        (matched[:, 1] - a_flat[:, 1]) / diag,
        (zgm - za) / a_flat[:, 5],
        np.log(matched[:, 3] / a_flat[:, 3]),
        np.log(matched[:, 4] / a_flat[:, 4]),
        np.log(matched[:, 5] / a_flat[:, 5]),
        matched[:, 6] - a_flat[:, 6],
        (matched[:, 7] - a_flat[:, 7]) / diag,
        (matched[:, 8] - a_flat[:, 8]) / diag], -1)
    tgt = np.where(is_pos[:, None], tgt, 0.0)

    one_hot = np.eye(5)[labels][:, :4]
    psig = 1 / (1 + np.exp(-cls_np))
    ce = np.logaddexp(0, cls_np) - cls_np * one_hot
    p_t = psig * one_hot + (1 - psig) * (1 - one_hot)
    alpha_t = 0.25 * one_hot + 0.75 * (1 - one_hot)
    cls_loss = (alpha_t * (1 - p_t) ** 2 * ce * lw[:, None]).sum() / num_pos

    pred = box_np.copy()
    tgt2 = tgt.copy()
    pr, tr = pred[:, 6].copy(), tgt[:, 6].copy()
    pred[:, 6] = np.sin(pr) * np.cos(tr)
    tgt2[:, 6] = np.cos(pr) * np.sin(tr)
    code_w = np.array([1.0] * 7 + [0.2, 0.2])
    diff = np.abs(pred - tgt2)
    beta = 1.0 / 9.0
    sl1 = np.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    reg_loss = (sl1 * code_w * is_pos[:, None]).sum() / num_pos

    rot = matched[:, 6] - 0.7854
    dtgt = np.where(is_pos, np.floor(rot / np.pi).astype(int) % 2, 0)
    logp = dir_np - np.log(np.exp(dir_np).sum(-1, keepdims=True))
    dce = -logp[np.arange(A), dtgt]
    dir_loss = 0.2 * (dce * is_pos).sum() / num_pos

    assert np.isclose(loss_f['loss_cls'], cls_loss, rtol=1e-3, atol=1e-5), \
        (loss_f['loss_cls'], cls_loss)
    assert np.isclose(loss_f['loss_bbox'], reg_loss, rtol=1e-3,
                      atol=1e-5), (loss_f['loss_bbox'], reg_loss)
    assert np.isclose(loss_f['loss_dir'], dir_loss, rtol=1e-3,
                      atol=1e-5), (loss_f['loss_dir'], dir_loss)

    # ---- KLD depth-distribution loss on the shared depth output ----
    fh, fw = IMG_HW[0] // 4, IMG_HW[1] // 4
    gt_g = rng.dirichlet(np.ones(LSS_CFG.depth_bins),
                         (6, fh, fw)).astype(np.float32)
    gt_min = rng.uniform(0, 12, (6, fh, fw)).astype(np.float32)
    df = shared['out']['depth'][0]
    loss_kld_f = float(depth_dist_loss(
        jnp.asarray(df), jnp.asarray(gt_g), jnp.asarray(gt_min),
        LSS_CFG.camera_depth_range))
    d64 = df.astype(np.float64)
    m = (gt_min >= 1.0) & (gt_min <= 9.0)
    per = (gt_g * (np.log(np.clip(gt_g, 1e-12, None))
                   - np.log(d64 + 1e-4))).sum(-1)
    loss_kld_np = (per * m).sum() / max(m.sum(), 1)
    assert np.isclose(loss_kld_f, loss_kld_np, rtol=1e-3, atol=1e-5)

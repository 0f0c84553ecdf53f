"""Forward parity of the riskiest redesigned modules against plain
PyTorch mirrors of the reference math (VERDICT r3 #5).

The in-repo jnp references pin OUR semantics; these tests pin them to
an INDEPENDENT framework implementation of the reference's published
structure, with shared weights:

* DepthNet — torch mirror of the reference
  ``cam_stream_lss_bevpoolv2_depthnet.py:537-582`` (reduce conv ->
  context 1x1 / BasicBlock x3 + ASPP + 1x1 depth logits).  Two
  documented deviations are mirrored as-we-built-them: the DCN stage is
  off (PARITY.md capacity deviation) and the reduce conv drops its
  BN-redundant bias.
* multi_scale_deformable_attn — torch ``F.grid_sample`` formulation of
  ``multi_scale_deformable_attn_pytorch`` (the reference's pure-torch
  spec at ``temporal_self_attention.py:254-257``), including
  out-of-bounds zero-padding taps.

Weights flow flax -> torch (HWIO -> OIHW), so no name-mapping machinery
is under test — only the math.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                                   # noqa: E402
import torch.nn.functional as F                          # noqa: E402

from omnihd_scenes_tpu.models.lss import DepthNet        # noqa: E402
from omnihd_scenes_tpu.ops.ms_deform_attn import (       # noqa: E402
    multi_scale_deformable_attn)


def _t(x):
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _conv_w(flax_kernel):
    """HWIO -> OIHW torch conv weight."""
    return torch.nn.Parameter(_t(np.transpose(flax_kernel, (3, 2, 0, 1))))


class _TorchBN(tnn.BatchNorm2d):
    pass


def _load_bn(bn: tnn.BatchNorm2d, params, stats):
    bn.weight = torch.nn.Parameter(_t(params['scale']))
    bn.bias = torch.nn.Parameter(_t(params['bias']))
    bn.running_mean = _t(stats['mean'])
    bn.running_var = _t(stats['var'])


class TorchDepthNetMirror(tnn.Module):
    """Reference DepthNet structure in plain torch (see module
    docstring for the two mirrored deviations)."""

    def __init__(self, cin, mid, ctx_ch, depth_bins):
        super().__init__()
        # eps mirrors the flax modules: ConvBNReLU uses BN_EPS=1e-3,
        # BasicBlock/ASPP use the flax default 1e-5.
        self.reduce_conv = tnn.Conv2d(cin, mid, 3, padding=1, bias=False)
        self.reduce_bn = _TorchBN(mid, eps=1e-3)
        self.context_conv = tnn.Conv2d(mid, ctx_ch, 1)
        self.blocks = tnn.ModuleList()
        for _ in range(3):
            blk = tnn.ModuleDict({
                'conv1': tnn.Conv2d(mid, mid, 3, padding=1, bias=False),
                'bn1': _TorchBN(mid, eps=1e-5),
                'conv2': tnn.Conv2d(mid, mid, 3, padding=1, bias=False),
                'bn2': _TorchBN(mid, eps=1e-5),
            })
            self.blocks.append(blk)
        # ASPP: 1x1 + three dilated 3x3 + global-average branch.
        dils = [1, 6, 12, 18]
        self.aspp_convs = tnn.ModuleList([
            tnn.Conv2d(mid, mid, 1 if d == 1 else 3,
                       padding=0 if d == 1 else d,
                       dilation=d, bias=False) for d in dils])
        self.aspp_bns = tnn.ModuleList(
            [_TorchBN(mid, eps=1e-5) for _ in dils])
        self.aspp_gconv = tnn.Conv2d(mid, mid, 1, bias=False)
        self.aspp_gbn = _TorchBN(mid, eps=1e-5)
        self.aspp_out = tnn.Conv2d(mid * 5, mid, 1, bias=False)
        self.aspp_obn = _TorchBN(mid, eps=1e-5)
        self.depth_out = tnn.Conv2d(mid, depth_bins, 1)

    def forward(self, x):
        x = F.relu(self.reduce_bn(self.reduce_conv(x)))
        ctx = self.context_conv(x)
        d = x
        for blk in self.blocks:
            y = F.relu(blk['bn1'](blk['conv1'](d)))
            y = blk['bn2'](blk['conv2'](y))
            d = F.relu(y + d)
        branches = [F.relu(bn(cv(d)))
                    for cv, bn in zip(self.aspp_convs, self.aspp_bns)]
        g = d.mean(dim=(2, 3), keepdim=True)
        g = F.relu(self.aspp_gbn(self.aspp_gconv(g)))
        g = g.expand(-1, -1, d.shape[2], d.shape[3])
        d = torch.cat(branches + [g], dim=1)
        d = F.relu(self.aspp_obn(self.aspp_out(d)))
        # (reference has Dropout(0.5) here — identity in eval mode —
        # and a DCN stage that our build disables, PARITY.md)
        return ctx, self.depth_out(d)


def _copy_depthnet_params(mirror: TorchDepthNetMirror, variables):
    p, s = variables['params'], variables['batch_stats']
    mirror.reduce_conv.weight = _conv_w(
        p['ConvBNReLU_0']['Conv_0']['kernel'])
    _load_bn(mirror.reduce_bn, p['ConvBNReLU_0']['BatchNorm_0'],
             s['ConvBNReLU_0']['BatchNorm_0'])
    mirror.context_conv.weight = _conv_w(p['Conv_0']['kernel'])
    mirror.context_conv.bias = torch.nn.Parameter(_t(p['Conv_0']['bias']))
    for i, blk in enumerate(mirror.blocks):
        bp, bs = p[f'BasicBlock_{i}'], s[f'BasicBlock_{i}']
        blk['conv1'].weight = _conv_w(bp['Conv_0']['kernel'])
        _load_bn(blk['bn1'], bp['BatchNorm_0'], bs['BatchNorm_0'])
        blk['conv2'].weight = _conv_w(bp['Conv_1']['kernel'])
        _load_bn(blk['bn2'], bp['BatchNorm_1'], bs['BatchNorm_1'])
    ap, as_ = p['ASPP_0'], s['ASPP_0']
    for i in range(4):
        mirror.aspp_convs[i].weight = _conv_w(ap[f'Conv_{i}']['kernel'])
        _load_bn(mirror.aspp_bns[i], ap[f'BatchNorm_{i}'],
                 as_[f'BatchNorm_{i}'])
    mirror.aspp_gconv.weight = _conv_w(ap['Conv_4']['kernel'])
    _load_bn(mirror.aspp_gbn, ap['BatchNorm_4'], as_['BatchNorm_4'])
    mirror.aspp_out.weight = _conv_w(ap['Conv_5']['kernel'])
    _load_bn(mirror.aspp_obn, ap['BatchNorm_5'], as_['BatchNorm_5'])
    mirror.depth_out.weight = _conv_w(p['Conv_1']['kernel'])
    mirror.depth_out.bias = torch.nn.Parameter(_t(p['Conv_1']['bias']))


def test_depthnet_forward_matches_torch_mirror():
    """fp32 eval forward agreement on shared random weights + running
    stats — the redesigned DepthNet computes the reference function."""
    cin, mid, ctx_ch, depth_bins = 12, 16, 5, 7
    model = DepthNet(depth_bins=depth_bins, cam_channels=ctx_ch,
                     mid_channels=mid)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 24, cin).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    # Non-trivial BN params/stats so normalization order and eps are
    # actually exercised (fresh init is scale=1, mean=0, var=1).
    def _randomize(tree, path=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = _randomize(v, path + (k,))
            elif k in ('scale', 'var'):
                out[k] = np.abs(rng.randn(*v.shape)).astype(np.float32) \
                    + 0.5
            elif k in ('bias', 'mean'):
                out[k] = rng.randn(*v.shape).astype(np.float32) * 0.2
            else:
                out[k] = v
        return out

    variables = {'params': _randomize(variables['params']),
                 'batch_stats': _randomize(variables['batch_stats'])}

    ctx_j, depth_j, logits_j = model.apply(variables, x, train=False)

    mirror = TorchDepthNetMirror(cin, mid, ctx_ch, depth_bins)
    _copy_depthnet_params(mirror, variables)
    mirror.eval()
    with torch.no_grad():
        ctx_t, logits_t = mirror(_t(np.transpose(x, (0, 3, 1, 2))))
    ctx_t = ctx_t.permute(0, 2, 3, 1).numpy()
    logits_t = logits_t.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ctx_j), ctx_t,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               atol=2e-4, rtol=2e-4)
    # And the softmax depth distribution follows.
    depth_t = torch.softmax(torch.from_numpy(logits_t), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(depth_j), depth_t, atol=1e-5)


def _msda_torch(value, spatial_shapes, loc, weights):
    """Reference spec (``multi_scale_deformable_attn_pytorch``): per
    level, grid_sample(align_corners=False, padding zeros) at the
    predicted locations, weighted sum over levels and points.

    value: (nk, nh, d); loc: (nq, nh, nl, np, 2) in [0,1];
    weights: (nq, nh, nl, np) -> (nq, nh*d).
    """
    nk, nh, d = value.shape
    nq, _, nl, npts, _ = loc.shape
    out = torch.zeros(nq, nh, d)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[offset:offset + h * w]                 # (hw, nh, d)
        offset += h * w
        # (nh, d, h, w) for grid_sample's NCHW.
        v = v.reshape(h, w, nh, d).permute(2, 3, 0, 1)
        grid = 2.0 * loc[:, :, lvl] - 1.0                # (nq, nh, np, 2)
        grid = grid.permute(1, 0, 2, 3)                  # (nh, nq, np, 2)
        sampled = F.grid_sample(v, grid, mode='bilinear',
                                padding_mode='zeros',
                                align_corners=False)     # (nh, d, nq, np)
        w_l = weights[:, :, lvl].permute(1, 0, 2)        # (nh, nq, np)
        out += (sampled * w_l[:, None]).sum(-1).permute(2, 0, 1)
    return out.reshape(nq, nh * d)


@pytest.mark.parametrize('shapes', [((8, 12),), ((8, 12), (4, 6))])
def test_ms_deform_attn_matches_torch_grid_sample(shapes):
    """Our patch-gather bilinear formulation == torch grid_sample
    semantics, including OOB zero taps and multi-level sums."""
    rng = np.random.RandomState(42)
    nh, d, nq, npts = 4, 8, 37, 5
    nk = sum(h * w for h, w in shapes)
    value = rng.randn(nk, nh, d).astype(np.float32)
    # Locations span in-bounds, near-edge and clearly OOB.
    loc = rng.uniform(-0.3, 1.3,
                      (nq, nh, len(shapes), npts, 2)).astype(np.float32)
    w = rng.rand(nq, nh, len(shapes), npts).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    ours = np.asarray(multi_scale_deformable_attn(
        value, shapes, loc, w))
    ref = _msda_torch(_t(value), shapes, _t(loc), _t(w)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_ms_deform_attn_chunked_matches_torch():
    """The query-chunked path (production BEV scale uses it) is the
    same function."""
    rng = np.random.RandomState(7)
    shapes = ((6, 9),)
    nh, d, nq, npts = 2, 4, 53, 3
    value = rng.randn(shapes[0][0] * shapes[0][1], nh, d).astype(
        np.float32)
    loc = rng.uniform(-0.1, 1.1, (nq, nh, 1, npts, 2)).astype(np.float32)
    w = rng.rand(nq, nh, 1, npts).astype(np.float32)

    ours = np.asarray(multi_scale_deformable_attn(
        value, shapes, loc, w, query_chunk=16))
    ref = _msda_torch(_t(value), shapes, _t(loc), _t(w)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

"""Torch->flax importer tests.

A minimal torch ResNet-18 with exact torchvision naming is built
in-test (torchvision itself is not installed), randomly initialized,
and imported; the flax forward must match the torch eval forward
numerically — the strongest possible check of the name map and the
OIHW->HWIO / BN-buffer conversions.  Mirrors the reference's staged
pretraining needs (``/root/reference/tools/train.py:276-428``).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402

from omnihd_scenes_tpu.models.resnet import ResNet  # noqa: E402
from omnihd_scenes_tpu.train.torch_import import (  # noqa: E402
    LOAD_IMG_FROM_RULES, import_by_rules, import_torchvision_resnet,
    resnet_name_map)


def _torch_resnet18():
    """torchvision-equivalent ResNet-18 trunk (no fc/avgpool)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            self.layer1 = tnn.Sequential(BasicBlock(64, 64),
                                         BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2),
                                         BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2),
                                         BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2),
                                         BasicBlock(512, 512))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            outs = []
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                x = layer(x)
                outs.append(x)
            return outs

    net = Net().eval()
    # Randomize BN buffers so the parity test exercises them.
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) + 0.5)
                m.weight.copy_(torch.rand(
                    m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    return net


@pytest.fixture(scope='module')
def torch_net_and_sd():
    net = _torch_resnet18()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return net, sd


def test_name_map_covers_state_dict(torch_net_and_sd):
    _, sd = torch_net_and_sd
    nmap = resnet_name_map(18)
    torch_keys = {k for k in sd if 'num_batches_tracked' not in k}
    assert torch_keys == set(nmap), (
        torch_keys.symmetric_difference(set(nmap)))


def test_numeric_parity_full_forward(torch_net_and_sd):
    net, sd = torch_net_and_sd
    model = ResNet(depth=18, out_indices=(0, 1, 2, 3), frozen_bn=True)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)

    target = model.init(jax.random.PRNGKey(0), x)
    variables, report = import_torchvision_resnet(
        sd, 18, target_variables=jax.tree.map(np.asarray, dict(target)),
        verbose=False)
    assert not report['missing'] and not report['mismatched']
    assert not report['unused']

    got = model.apply(variables, x, train=False)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for g, w in zip(got, want):
        w = w.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4, atol=2e-4)


def test_import_by_rules_into_prefixed_tree(torch_net_and_sd):
    """The reference ``load_img_from`` policy: a bare-backbone
    state_dict lands under img_backbone/ in a bigger model tree."""
    _, sd = torch_net_and_sd
    model = ResNet(depth=18, out_indices=(3,))
    x = np.zeros((1, 32, 32, 3), np.float32)
    inner = model.init(jax.random.PRNGKey(0), x)
    target = {'params': {'img_backbone': dict(inner['params']),
                         'head': {'kernel': np.zeros((512, 4))}},
              'batch_stats': {'img_backbone': dict(inner['batch_stats'])}}

    sd_prefixed = {f'backbone.{k}': v for k, v in sd.items()}
    # Rule-driven literal-path resolution only handles flat dotted
    # names; resnet block names need the dedicated table:
    variables, report = import_torchvision_resnet(
        {k[len('backbone.'):]: v for k, v in sd_prefixed.items()}, 18,
        target_variables=target, prefix=('img_backbone',), verbose=False)
    assert not report['missing'] and not report['mismatched']
    # Head stays at init.
    assert float(np.abs(variables['params']['head']['kernel']).sum()) == 0


def test_import_by_rules_generic_convs():
    """Generic rule import: conv + bn layers named by dotted paths."""
    import flax.linen as nn

    class Small(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), name='stem', use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=True, name='norm')(x)
            return nn.Dense(4, name='fc_out')(x)

    m = Small()
    target = m.init(jax.random.PRNGKey(0), np.zeros((1, 8, 8, 3),
                                                    np.float32))
    rng = np.random.RandomState(1)
    sd = {
        'img.stem.weight': rng.randn(8, 3, 3, 3).astype(np.float32),
        'img.norm.weight': rng.rand(8).astype(np.float32),
        'img.norm.bias': rng.randn(8).astype(np.float32),
        'img.norm.running_mean': rng.randn(8).astype(np.float32),
        'img.norm.running_var': rng.rand(8).astype(np.float32),
        'img.norm.num_batches_tracked': np.int64(7),
        'img.fc_out.weight': rng.randn(4, 8).astype(np.float32),
        'img.fc_out.bias': rng.randn(4).astype(np.float32),
        'dropped.thing.weight': rng.randn(3, 3).astype(np.float32),
    }
    merged, report = import_by_rules(
        jax.tree.map(np.asarray, dict(target)), sd,
        rules=(('img', ()),), drop_prefixes=('dropped',), verbose=False)
    assert report['coverage'] == 1.0, report
    np.testing.assert_array_equal(
        merged['params']['stem']['kernel'],
        sd['img.stem.weight'].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        merged['params']['fc_out']['kernel'], sd['img.fc_out.weight'].T)
    np.testing.assert_array_equal(
        merged['batch_stats']['norm']['mean'],
        sd['img.norm.running_mean'])


# ---------------------------------------------------------------------------
# Experiment-workflow wiring (reference tools/train.py:276-428): config
# keys load_img_from / pretrained route through apply_pretrained into
# the model tree, including compact-module (auto-named) backbones, and
# the training CLI logs the per-key report.
# ---------------------------------------------------------------------------

def test_apply_pretrained_compact_backbone_parity(torch_net_and_sd,
                                                  tmp_path):
    """find_backbone_prefix locates an auto-named (nn.compact) ResNet
    and the imported block matches the torch forward numerically."""
    import flax.linen as nn

    from omnihd_scenes_tpu.train.torch_import import (apply_pretrained,
                                                      find_backbone_prefix)

    net, sd = torch_net_and_sd

    class Wrapper(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = ResNet(depth=18, out_indices=(0, 1, 2, 3),
                           frozen_bn=True)(x, train=train)
            return feats

    model = Wrapper()
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    variables = jax.tree.map(np.asarray, dict(model.init(
        jax.random.PRNGKey(0), x)))

    prefix = find_backbone_prefix(variables)
    assert prefix == ('ResNet_0',)

    pth = str(tmp_path / 'resnet18.pth')
    torch.save(net.state_dict(), pth)
    merged, reports = apply_pretrained(variables, load_img_from=pth,
                                       resnet_depth=18, verbose=False)
    rep = reports['load_img_from']
    # 100% backbone coverage.
    assert len(rep['loaded']) == len(resnet_name_map(18))
    assert not rep['missing'] and not rep['mismatched']

    got = model.apply(merged, x, train=False)
    with torch.no_grad():
        want = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4)


def test_pretrained_torchvision_scheme(torch_net_and_sd, tmp_path,
                                       monkeypatch):
    """pretrained='torchvision://resnet18' resolves against the local
    torch-hub cache (no egress here)."""
    from omnihd_scenes_tpu.train.torch_import import (apply_pretrained,
                                                      resolve_pretrained_path)

    net, sd = torch_net_and_sd
    hub = tmp_path / 'hub' / 'checkpoints'
    hub.mkdir(parents=True)
    torch.save(net.state_dict(), str(hub / 'resnet18-f37072fd.pth'))
    monkeypatch.setenv('TORCH_HOME', str(tmp_path))

    assert resolve_pretrained_path(
        'torchvision://resnet18').endswith('resnet18-f37072fd.pth')

    model = ResNet(depth=18, out_indices=(3,), frozen_bn=True)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = jax.tree.map(np.asarray, dict(model.init(
        jax.random.PRNGKey(0), x)))
    merged, reports = apply_pretrained(
        variables, pretrained='torchvision://resnet18', verbose=False)
    rep = reports['pretrained']
    assert len(rep['loaded']) == len(resnet_name_map(18))
    assert not rep['missing'] and not rep['mismatched']

    with pytest.raises(FileNotFoundError):
        monkeypatch.setenv('TORCH_HOME', str(tmp_path / 'nope'))
        resolve_pretrained_path('torchvision://resnet18')


@pytest.mark.slow
def test_cli_load_img_from_logs_full_coverage(torch_net_and_sd,
                                              synthetic_dataroot,
                                              tmp_path, monkeypatch):
    """The actual CLI path: tools.train on a config with
    load_img_from=<torchvision-format .pth> loads the full backbone and
    logs the per-key report (reference tools/train.py:306-315)."""
    import json
    import sys

    from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
    from omnihd_scenes_tpu.tools import train as train_cli

    net, sd = torch_net_and_sd
    pth = str(tmp_path / 'resnet18.pth')
    torch.save(net.state_dict(), pth)

    infos = str(tmp_path / 'infos')
    create_newscenes_infos(synthetic_dataroot, infos, 'synth',
                           version='v1.0-mini', max_sweeps=2)
    work = str(tmp_path / 'work')
    monkeypatch.setattr(sys, 'argv', [
        'train.py', 'configs/synthetic/bevfusion_synth.py',
        '--no-validate', '--work-dir', work, '--cfg-options',
        f'dataroot={synthetic_dataroot}',
        f'load_img_from={pth}',
        f'data.train.ann_file={infos}/synth_infos_temporal_train.pkl',
        f'data.val.ann_file={infos}/synth_infos_temporal_val.pkl',
    ])
    train_cli.main()

    recs = [json.loads(line) for line in
            open(f'{work}/train.log.json')]
    rep = [r for r in recs if r.get('mode') == 'load_img_from']
    assert rep, recs
    assert rep[0]['loaded'] == len(resnet_name_map(18))
    assert rep[0]['missing'] == 0 and rep[0]['mismatched'] == 0
    assert any(r.get('mode') == 'done' for r in recs)

    # Resume takes precedence over pretrained init (mmcv semantics):
    # relaunching with --resume-from must NOT re-apply the torch
    # weights over the restored checkpoint.
    import glob
    ckpt = sorted(glob.glob(f'{work}/ckpts/ckpt_*'))[-1]
    work2 = str(tmp_path / 'work2')
    monkeypatch.setattr(sys, 'argv', [
        'train.py', 'configs/synthetic/bevfusion_synth.py',
        '--no-validate', '--work-dir', work2,
        '--resume-from', ckpt, '--cfg-options',
        f'dataroot={synthetic_dataroot}',
        f'load_img_from={pth}',
        f'data.train.ann_file={infos}/synth_infos_temporal_train.pkl',
        f'data.val.ann_file={infos}/synth_infos_temporal_val.pkl',
    ])
    train_cli.main()
    recs2 = [json.loads(line) for line in open(f'{work2}/train.log.json')]
    assert any(r.get('mode') == 'resume' for r in recs2)
    assert not [r for r in recs2 if r.get('mode') == 'load_img_from']

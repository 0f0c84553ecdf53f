"""Every shipped config must parse and build its model + anchors."""

import glob
import os.path as osp

import pytest

from omnihd_scenes_tpu.train.builder import anchors_for, build_model_from_cfg
from omnihd_scenes_tpu.train.config import Config

CONFIG_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      'configs')
ALL_CONFIGS = sorted(glob.glob(osp.join(CONFIG_DIR, '*.py'))
                     + glob.glob(osp.join(CONFIG_DIR, 'synthetic', '*.py')))


@pytest.mark.parametrize('path', ALL_CONFIGS,
                         ids=[osp.basename(p) for p in ALL_CONFIGS])
def test_config_builds(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg
    assert 'data' in cfg
    model, mtype = build_model_from_cfg(cfg)
    anchors = anchors_for(model, mtype)
    if mtype != 'bevformer':
        assert anchors is not None
        assert anchors.ndim == 4 and anchors.shape[-1] == 9
    # Dataset kwargs must be accepted by the dataset classes.
    from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
    from omnihd_scenes_tpu.data.temporal_dataset import (
        TemporalNewScenesDataset)
    import inspect

    ds_cls = (TemporalNewScenesDataset
              if cfg.get('dataset_type', 'det') == 'temporal'
              else NewScenesDetDataset)
    sig = inspect.signature(ds_cls.__init__)
    base_sig = inspect.signature(NewScenesDetDataset.__init__)
    valid = set(sig.parameters) | set(base_sig.parameters)
    for split in ('train', 'val'):
        for key in cfg.data.get(split).to_dict():
            assert key in valid, f'{osp.basename(path)}: {split}.{key}'


def test_base_inheritance():
    cfg = Config.fromfile(osp.join(CONFIG_DIR, 'rcfusion.py'))
    # Inherited from bevfusion.py with the fusion mode overridden.
    assert cfg.model_type == 'rcfusion'
    assert cfg.model.rc_fusion == 'cross_attention'
    assert cfg.model.lss['final_dim'] == (544, 960)  # from base


def test_cfg_options_override():
    cfg = Config.fromfile(osp.join(CONFIG_DIR, 'bevfusion.py'))
    cfg.merge_from_options(['optimizer.lr=0.5', 'total_epochs=2',
                            'model.se=False'])
    assert cfg.optimizer.lr == 0.5
    assert cfg.total_epochs == 2
    assert cfg.model.se is False

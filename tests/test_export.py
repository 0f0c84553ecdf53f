"""AOT export bundle (omnihd_scenes_tpu.serve.export).

Export -> serialize to disk -> load WITHOUT model code -> run must
reproduce the live model's outputs.
"""

import jax
import numpy as np
import pytest

from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                PointPillarsConfig)
from omnihd_scenes_tpu.serve import export_model, load_exported


@pytest.fixture(scope='module')
def tiny_model():
    cfg = PointPillarsConfig(
        point_cloud_range=(-10, -10, -3.0, 10, 10, 5.0),
        voxel_size=(2.0, 2.0, 8.0), max_voxels=64,
        max_points_per_voxel=4, bev_hw=(10, 10),
        pfn_channels=(8,), second_channels=(8, 8, 8),
        fpn_channels=(8, 8, 8))
    model = PointPillars(cfg)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-9, 9, (1, 64, 8)).astype(np.float32)
    mask = np.ones((1, 64), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    return model, cfg, variables, (pts, mask)


@pytest.mark.slow
def test_export_roundtrip_matches_live(tmp_path, tiny_model):
    model, cfg, variables, inputs = tiny_model
    out = export_model(model, 'pointpillars', variables, inputs,
                       str(tmp_path / 'bundle'),
                       anchors_np=cfg.anchors(), bf16=False)

    loaded = load_exported(out)
    assert loaded.meta['mtype'] == 'pointpillars'
    got = loaded(*inputs)

    from omnihd_scenes_tpu.models.anchor_head import (
        DecodeCfg, anchor_head_get_bboxes)
    raw = model.apply(variables, *inputs, train=False)
    import functools

    anchors_b = np.broadcast_to(cfg.anchors()[None],
                                (1,) + cfg.anchors().shape)
    want = jax.vmap(functools.partial(anchor_head_get_bboxes,
                                      cfg=DecodeCfg()))(
        raw['cls_score'].astype(np.float32),
        raw['bbox_pred'].astype(np.float32),
        raw['dir_pred'].astype(np.float32),
        np.ascontiguousarray(anchors_b, np.float32))
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_export_bundle_is_self_contained(tmp_path, tiny_model):
    model, cfg, variables, inputs = tiny_model
    out = export_model(model, 'pointpillars', variables, inputs,
                       str(tmp_path / 'bundle2'),
                       anchors_np=cfg.anchors(), bf16=False)
    import os
    files = set(os.listdir(out))
    assert {'exported.stablehlo', 'params.msgpack',
            'meta.json'} <= files
    # Bundle loads from the serialized bytes alone (fresh objects).
    loaded = load_exported(out)
    boxes, scores, labels, valid = loaded(*inputs)
    assert boxes.shape[0] == 1 and np.isfinite(
        np.asarray(scores, np.float32)).all()


def test_export_dict_batch_path(tmp_path, tiny_model):
    """The documented loaders-dict input form must export identically
    to the positional form (regression: it used to crash)."""
    model, cfg, variables, inputs = tiny_model
    batch = {'points': inputs[0], 'points_mask': inputs[1]}
    out = export_model(model, 'pointpillars', variables, batch,
                       str(tmp_path / 'bundle_dict'),
                       anchors_np=cfg.anchors(), bf16=False)
    loaded = load_exported(out)
    got = loaded(*inputs)
    boxes, scores, labels, valid = got
    assert boxes.shape[0] == 1 and np.isfinite(
        np.asarray(scores, np.float32)).all()

"""End-to-end int8 accuracy delta (VERDICT r3 #6; opt-in:
OMNIHD_SLOW_TESTS=1).

The int8 PTQ tier had speed numbers (BENCH.md: ~parity on this chip)
but no recorded accuracy story.  This reuses the splat-A/B training
harness (tests/test_splat_ab.py — the camera LSS detector that reaches
>0.94 mAP on the dedicated synthetic set), trains ONE model, then
evaluates the SAME weights float vs int8 (calib -> freeze -> int8, the
``tools/test.py --int8`` deployment flow) through the full devkit eval
and bounds the degradation.

Measured numbers are recorded in BENCH.md "int8 accuracy delta".

Run standalone:  OMNIHD_SLOW_TESTS=1 python -m pytest \
    tests/test_quant_accuracy.py -s     (or python tests/test_quant_accuracy.py)
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get('OMNIHD_SLOW_TESTS') != '1',
    reason='slow A/B training test; set OMNIHD_SLOW_TESTS=1')


def _train_once(dataroot, pkl, tmp_path):
    """Train the splat-AB 'sample' arm once; return (model, state,
    datasets, anchors)."""
    import jax

    from omnihd_scenes_tpu.data.loader import TrainLoader
    from omnihd_scenes_tpu.train.builder import (anchors_for,
                                                 make_loss_fn_generic)
    from omnihd_scenes_tpu.train.loop import (create_train_state,
                                              make_train_step)
    from omnihd_scenes_tpu.train.optim import (make_lr_schedule,
                                               make_optimizer)
    from tests.test_splat_ab import EPOCHS, LR, _build, _datasets

    model = _build('sample')
    train_ds, eval_ds = _datasets(pkl)
    s0 = train_ds[0]
    variables = model.init(
        jax.random.PRNGKey(0), points=None, points_mask=None,
        imgs=s0['imgs'][None], rots=s0['img2lidar_rots'][None],
        trans=s0['img2lidar_trans'][None], train=False)
    loader = TrainLoader(train_ds, 4, seed=0)
    anchors = anchors_for(model, 'lss')
    tx = make_optimizer(make_lr_schedule(LR, len(loader) * EPOCHS,
                                         warmup_iters=20))
    state = create_train_state(variables, tx)
    step_fn = make_train_step(
        make_loss_fn_generic(model, 'lss', anchors), tx)
    for ep in range(EPOCHS):
        loader.set_epoch(ep)
        for batch in loader:
            state, loss, _ = step_fn(state, batch)
    assert np.isfinite(float(loss))
    return model, state, (train_ds, eval_ds), anchors


def _evaluate(model, state, eval_ds, anchors, dataroot, tmp_path, tag,
              extra_variables=None):
    from omnihd_scenes_tpu.models.anchor_head import DecodeCfg
    from omnihd_scenes_tpu.train.builder import make_predict_fn_generic
    from omnihd_scenes_tpu.train.eval_runner import run_inference_generic

    predict_fn = make_predict_fn_generic(
        model, 'lss', anchors, DecodeCfg(nms_pre=512, max_num=128),
        extra_variables=extra_variables)
    outputs = run_inference_generic(predict_fn, state, eval_ds, 2, 'lss')
    return eval_ds.evaluate(
        outputs['bbox_results'], dataroot=dataroot,
        version='v1.0-mini', eval_set='train_mini',
        jsonfile_prefix=str(tmp_path / f'eval_{tag}'))


def _int8_vars(model, state, sample):
    """calib -> freeze on one batch; returns the quant collection."""
    import jax

    from omnihd_scenes_tpu.models import quant

    inputs = dict(points=None, points_mask=None,
                  imgs=sample['imgs'][None],
                  rots=sample['img2lidar_rots'][None],
                  trans=sample['img2lidar_trans'][None])
    fn = jax.jit(lambda v: model.apply(v, train=False,
                                       mutable=['quant'], **inputs)[1])
    quant.set_mode('calib')
    muts = jax.device_get(fn({'params': state.params,
                              'batch_stats': state.batch_stats}))['quant']
    quant.set_mode('freeze')
    muts = jax.device_get(fn({'params': state.params,
                              'batch_stats': state.batch_stats,
                              'quant': muts}))['quant']
    quant.set_mode('int8')
    return {'quant': muts}


def _run(tmp_root):
    from omnihd_scenes_tpu.models import quant
    from tests.test_splat_ab import _make_data

    dataroot, pkl = _make_data(str(tmp_root))
    model, state, (train_ds, eval_ds), anchors = _train_once(
        dataroot, pkl, tmp_root)
    try:
        m_float = _evaluate(model, state, eval_ds, anchors, dataroot,
                            tmp_root, 'float')
        qvars = _int8_vars(model, state, eval_ds[0])
        m_int8 = _evaluate(model, state, eval_ds, anchors, dataroot,
                           tmp_root, 'int8', extra_variables=qvars)
    finally:
        quant.set_mode('off')
    return m_float, m_int8


def test_int8_eval_within_one_point_of_float(tmp_path_factory):
    root = tmp_path_factory.mktemp('int8_ab')
    m_float, m_int8 = _run(root)
    print(f"\nint8 accuracy A/B: float mAP={m_float['mAP']:.4f} "
          f"NOS={m_float['NOS']:.4f} | int8 mAP={m_int8['mAP']:.4f} "
          f"NOS={m_int8['NOS']:.4f} | delta mAP="
          f"{m_float['mAP'] - m_int8['mAP']:+.4f}")
    # Guard a vacuous 0-vs-0 pass, then bound the PTQ degradation at
    # 1 point of mAP and NOS (the recorded BENCH.md bound).
    assert m_float['mAP'] > 0.8, m_float
    assert m_int8['mAP'] >= m_float['mAP'] - 0.01, (m_float, m_int8)
    assert m_int8['NOS'] >= m_float['NOS'] - 0.01, (m_float, m_int8)


if __name__ == '__main__':
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        m_f, m_q = _run(Path(td))
        print(f"float: mAP={m_f['mAP']:.4f} NOS={m_f['NOS']:.4f}")
        print(f"int8:  mAP={m_q['mAP']:.4f} NOS={m_q['NOS']:.4f}")

"""Fuse Conv+BN in a trained checkpoint for deployment.

Parity target: ``/root/reference/tools/misc/fuse_conv_bn.py`` — load a
config + checkpoint, fold frozen BN statistics into the conv kernels
(dataflow-exact pairing, ``serve/fuse.py``), and write the fused
checkpoint ready for ``tools/export.py`` / ``tools/test.py``.

Usage:
    python -m omnihd_scenes_tpu.tools.fuse_conv_bn CONFIG CKPT_DIR \
        --out OUT_DIR
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description='Fuse conv+BN in a checkpoint')
    p.add_argument('config')
    p.add_argument('checkpoint', help='checkpoint directory (ckpts/)')
    p.add_argument('--out', required=True,
                   help='output checkpoint directory')
    p.add_argument('--cfg-options', nargs='+')
    return p.parse_args()


def main():
    import jax
    import numpy as np

    from omnihd_scenes_tpu.serve.fuse import fuse_model
    from omnihd_scenes_tpu.train.builder import (build_model_from_cfg,
                                                 init_model,
                                                 _model_inputs)
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import build_dataset_single
    from omnihd_scenes_tpu.train.loop import (create_train_state,
                                              load_checkpoint,
                                              save_checkpoint)
    from omnihd_scenes_tpu.train.optim import (make_lr_schedule,
                                               make_optimizer)

    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)

    dtype = cfg.get('dataset_type', 'det')
    test_cfg = cfg.data.get('test', cfg.data.val)
    dataset = build_dataset_single(test_cfg, dtype)
    sample = dataset[0]

    model, mtype = build_model_from_cfg(cfg)
    if mtype == 'bevformer':
        import jax.numpy as jnp

        bev_shape = (model.cfg.bev_h * model.cfg.bev_w,
                     model.cfg.embed_dims)
        variables = model.init(
            jax.random.PRNGKey(0), sample['imgs'], sample['can_bus'],
            sample['lidar2img'], np.zeros(bev_shape, np.float32),
            np.asarray(False), method=type(model).forward_stream)

        def apply_fn(v):
            return model.apply(v, sample['imgs'], sample['can_bus'],
                               sample['lidar2img'],
                               jnp.zeros(bev_shape, jnp.float32),
                               jnp.asarray(False),
                               method=type(model).forward_stream)
    else:
        variables = init_model(model, mtype, sample)
        batch = {k: v[None] for k, v in sample.items()
                 if hasattr(v, 'shape')}

        def apply_fn(v):
            return model.apply(v, train=False,
                               **_model_inputs(batch, mtype, False))

    tx = make_optimizer(make_lr_schedule(1e-3, 100, warmup_iters=10))
    state = create_train_state(variables, tx)
    state = load_checkpoint(args.checkpoint, state)

    fused, report = fuse_model(
        model, {'params': state.params, 'batch_stats': state.batch_stats},
        apply_fn)
    print(f"fuse_conv_bn: {len(report['fused'])} BN folded, "
          f"{len(report['skipped'])} skipped")
    for s in report['skipped'][:10]:
        print('  skipped:', s)

    state = state._replace(params=fused['params'],
                           batch_stats=fused.get('batch_stats',
                                                 state.batch_stats))
    save_checkpoint(args.out, state, int(state.step) or 1)
    print('fused checkpoint written to', args.out)


if __name__ == '__main__':
    main()

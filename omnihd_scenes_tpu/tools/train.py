"""Training CLI.

Parity target: ``tools/train.py`` + ``tools/dist_train.sh`` in the
reference — config file + ``--cfg-options`` dotted overrides, work-dir
logging with env/config dump, seeding, resume.  Multi-device data
parallelism needs no launcher: one process drives the whole mesh.

Usage:
    python -m omnihd_scenes_tpu.tools.train configs/pointpillars_radar.py \
        [--work-dir DIR] [--resume-from CKPT_DIR] [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config')
    p.add_argument('--work-dir')
    p.add_argument('--resume-from')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cfg-options', nargs='+')
    p.add_argument('--no-validate', action='store_true')
    p.add_argument('--bf16', action='store_true',
                   help='bf16 compute policy (reference fp16 train path)')
    return p.parse_args()


def main():
    from omnihd_scenes_tpu.parallel.mesh import make_mesh
    from omnihd_scenes_tpu.train.builder import (anchors_for,
                                                 build_model_from_cfg,
                                                 init_model,
                                                 make_loss_fn_generic,
                                                 make_predict_fn_generic)
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import build_datasets
    from omnihd_scenes_tpu.train.eval_runner import (evaluate_results,
                                                     run_inference_generic)
    from omnihd_scenes_tpu.train.loop import (JsonLogger, TrainState,
                                              create_train_state,
                                              load_checkpoint,
                                              make_train_step, run_training)
    from omnihd_scenes_tpu.train.optim import make_lr_schedule, make_optimizer
    from omnihd_scenes_tpu.data.loader import TrainLoader

    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    os.makedirs(cfg.work_dir, exist_ok=True)
    cfg.dump(osp.join(cfg.work_dir, 'config.py'))

    logger = JsonLogger(cfg.work_dir)
    logger.log({'mode': 'env', 'devices': str(jax.devices()),
                'n_devices': jax.device_count(),
                'config': osp.basename(args.config)})

    np.random.seed(args.seed)
    mesh = make_mesh()

    train_ds, val_ds = build_datasets(cfg)
    # Optional dataset wrapper (reference custom_build_dataset:
    # CBGSDataset / ClassBalancedDataset / RepeatDataset via
    # ``data.train.wrapper = dict(type=...)``).
    from omnihd_scenes_tpu.data.sampling import wrap_dataset

    train_ds = wrap_dataset(train_ds, cfg.data.train.get('wrapper'))
    batch_size = cfg.data.samples_per_device * jax.device_count()
    train_loader = TrainLoader(
        train_ds, batch_size, seed=args.seed,
        # reference workers_per_gpu: spawn-process sample preparation
        num_workers=int(cfg.data.get('workers_per_device',
                                     cfg.data.get('workers_per_gpu', 0))),
        # group-pure batches when the dataset exposes group flags
        group_flags=getattr(train_ds, 'group_flags', None))

    model, mtype = build_model_from_cfg(cfg)
    variables = init_model(model, mtype, train_ds[0],
                           jax.random.PRNGKey(args.seed))

    steps_per_epoch = len(train_loader)
    total_steps = steps_per_epoch * cfg.total_epochs
    opt_cfg = cfg.optimizer
    # Optional linear LR scaling (reference tools/train.py:173-175).
    lr = opt_cfg.lr
    if cfg.get('auto_scale_lr', False):
        lr = lr * jax.device_count() / 8
    schedule = make_lr_schedule(
        lr, total_steps,
        policy=cfg.lr_config.get('policy', 'cosine'),
        warmup_iters=min(cfg.lr_config.get('warmup_iters', 500),
                         max(total_steps // 10, 1)),
        warmup_ratio=cfg.lr_config.get('warmup_ratio', 1.0 / 3),
        step_epochs=cfg.lr_config.get('step', None),
        steps_per_epoch=steps_per_epoch)
    tx = make_optimizer(schedule, opt_cfg.get('weight_decay', 0.01),
                        cfg.get('grad_clip_norm', 35.0))

    state = create_train_state(variables, tx)
    if args.resume_from:
        state = load_checkpoint(args.resume_from, state)
        logger.log({'mode': 'resume', 'step': int(state.step)})

    # Pretrained image-backbone init from torch checkpoints (reference
    # tools/train.py:276-428 load_img_from + the implicit torchvision
    # pretrained= ImageNet init of every camera baseline).  Resume takes
    # precedence (mmcv semantics): re-applying the init after restoring
    # a mid-training checkpoint would silently overwrite the trained
    # backbone while keeping the optimizer state and schedule position.
    pretrained = cfg.get('pretrained', cfg.model.get('pretrained'))
    load_img_from = cfg.get('load_img_from')
    if args.resume_from:
        pretrained = load_img_from = None
    if pretrained or load_img_from:
        from omnihd_scenes_tpu.train.torch_import import apply_pretrained

        merged, reports = apply_pretrained(
            {'params': state.params, 'batch_stats': state.batch_stats},
            pretrained=pretrained, load_img_from=load_img_from,
            resnet_depth=cfg.model.get('resnet_depth'))
        state = state._replace(params=merged['params'],
                               batch_stats=merged.get('batch_stats',
                                                      state.batch_stats))
        for key, rep in reports.items():
            logger.log({'mode': key,
                        'loaded': len(rep['loaded']),
                        'missing': len(rep.get('missing', ())),
                        'mismatched': len(rep.get('mismatched', ())),
                        'skipped': len(rep.get('skipped', ()))})

    # Staged pretraining (reference load_img_from / load_lift_from /
    # load_pts_from chains).  Skipped on resume for the same reason.
    if ((cfg.get('load_lift_from') or cfg.get('load_pts_from'))
            and not args.resume_from):
        from omnihd_scenes_tpu.train.ckpt_remap import (load_lift_from,
                                                        load_pts_from)
        params = state.params
        for key, fn in (('load_lift_from', load_lift_from),
                        ('load_pts_from', load_pts_from)):
            path = cfg.get(key)
            if path:
                src = load_checkpoint(path, state).params
                params, report = fn(params, src)
                logger.log({'mode': key, 'loaded': len(report['loaded'])})
        state = state._replace(params=params)

    anchors_np = anchors_for(model, mtype)
    loss_fn = make_loss_fn_generic(
        model, mtype, anchors_np,
        depth_loss_weight=cfg.get('img_depth_loss_weight', 1.0))
    if args.bf16 or cfg.get('bf16', False):
        from omnihd_scenes_tpu.train.amp import bf16_policy

        loss_fn = bf16_policy(loss_fn)
    train_step = make_train_step(loss_fn, tx)

    eval_fn = None
    if not args.no_validate and mtype != 'bevformer':
        predict_fn = make_predict_fn_generic(model, mtype, anchors_np)

        def eval_fn(state):
            outputs = run_inference_generic(
                predict_fn, state, val_ds, cfg.data.samples_per_device,
                mtype)
            return evaluate_results(
                val_ds, outputs, cfg.dataroot, cfg.version, cfg.eval_set,
                osp.join(cfg.work_dir, 'eval'))

    t0 = time.time()
    state = run_training(
        state, train_step, train_loader, cfg.total_epochs, mesh=mesh,
        logger=logger, log_interval=cfg.get('log_interval', 50),
        ckpt_dir=osp.join(cfg.work_dir, 'ckpts'),
        ckpt_interval=cfg.get('ckpt_interval', 1),
        eval_fn=eval_fn, eval_interval=cfg.get('eval_interval', 1))
    logger.log({'mode': 'done', 'wall_time': time.time() - t0,
                'final_step': int(state.step)})


if __name__ == '__main__':
    main()

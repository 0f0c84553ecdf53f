"""Evaluation CLI.

Parity target: ``tools/test.py`` + ``tools/dist_test.sh`` — load a
config + checkpoint, run sharded inference, format results to the
NewScenes JSON and/or run the devkit eval.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp

import jax


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', help='checkpoint directory (ckpts/)')
    p.add_argument('--eval', action='store_true',
                   help='run the devkit detection eval')
    p.add_argument('--format-only', action='store_true')
    p.add_argument('--out-dir')
    p.add_argument('--cfg-options', nargs='+')
    return p.parse_args()


def main():
    from omnihd_scenes_tpu.parallel.mesh import make_mesh
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import (build_model,
                                                   make_predict_fn,
                                                   run_inference)
    from omnihd_scenes_tpu.data.dataset import NewScenesDetDataset
    from omnihd_scenes_tpu.train.loop import (create_train_state,
                                              load_checkpoint)
    from omnihd_scenes_tpu.train.optim import make_lr_schedule, make_optimizer

    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    out_dir = args.out_dir or osp.join(cfg.work_dir, 'test')

    mesh = make_mesh()
    test_cfg = cfg.data.get('test', cfg.data.val)
    dataset = NewScenesDetDataset(**test_cfg.to_dict())

    model = build_model(cfg)
    sample = dataset[0]
    variables = model.init(jax.random.PRNGKey(0), sample['points'][None],
                           sample['points_mask'][None], train=False)
    # Schedule-based optimizer so the opt-state leaf structure matches
    # the training-side checkpoint exactly.
    tx = make_optimizer(make_lr_schedule(1e-3, 100, warmup_iters=10))
    state = create_train_state(variables, tx)
    state = load_checkpoint(args.checkpoint, state)

    predict_fn = make_predict_fn(model)
    results = run_inference(predict_fn, state, dataset,
                            cfg.data.samples_per_device, mesh)

    if args.format_only:
        path = dataset.format_results(results, out_dir)
        print('Results written to', path)
        return

    if args.eval:
        metrics = dataset.evaluate(results, dataroot=cfg.dataroot,
                                   version=cfg.version,
                                   eval_set=cfg.eval_set,
                                   jsonfile_prefix=out_dir, verbose=True)
        print(json.dumps(metrics, indent=2))


if __name__ == '__main__':
    main()

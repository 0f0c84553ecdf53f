"""Inference FPS benchmark CLI.

Parity target: ``tools/analysis_tools/benchmark.py:1-102`` — measures
model samples/sec over the val set (or synthetic inputs when no
dataroot), skipping warmup iterations.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Benchmark inference FPS')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--samples', type=int, default=100)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--cfg-options', nargs='+')
    return p.parse_args()


def main():
    import jax

    from omnihd_scenes_tpu.train.builder import (anchors_for,
                                                 build_model_from_cfg,
                                                 init_model,
                                                 make_predict_fn_generic)
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import build_dataset_single
    from omnihd_scenes_tpu.train.loop import create_train_state
    from omnihd_scenes_tpu.train.optim import make_lr_schedule, make_optimizer
    from omnihd_scenes_tpu.data.loader import EvalLoader

    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)

    dataset = build_dataset_single(cfg.data.get('test', cfg.data.val),
                                   cfg.get('dataset_type', 'det'))
    model, mtype = build_model_from_cfg(cfg)
    variables = init_model(model, mtype, dataset[0])
    state = create_train_state(
        variables, make_optimizer(make_lr_schedule(1e-3, 10)))
    if args.checkpoint:
        from omnihd_scenes_tpu.train.loop import load_checkpoint
        state = load_checkpoint(args.checkpoint, state)

    predict_fn = make_predict_fn_generic(model, mtype,
                                         anchors_for(model, mtype))
    bs = cfg.data.samples_per_device
    loader = EvalLoader(dataset, bs)

    n_done = 0
    t_start = None
    for i, (batch, valid) in enumerate(loader):
        batch.pop('index')
        out = predict_fn(state.params, state.batch_stats, batch)
        # Scalar readback = the reference's per-batch cuda.synchronize
        # (block_until_ready returns immediately on async-relay
        # runtimes and would measure dispatch, not execution).
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        if i + 1 == args.warmup:
            t_start = time.perf_counter()
            n_done = 0
        elif i + 1 > args.warmup:
            n_done += int(valid.sum())
        if n_done >= args.samples:
            break

    dt = time.perf_counter() - t_start
    print(f'Overall fps: {n_done / dt:.2f} samples/sec '
          f'({dt / max(n_done, 1) * 1000:.1f} ms/sample)')


if __name__ == '__main__':
    main()

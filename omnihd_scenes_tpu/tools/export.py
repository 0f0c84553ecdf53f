"""Export a trained model as a deployable AOT bundle.

Usage:
    python -m omnihd_scenes_tpu.tools.export CONFIG CKPT_DIR --out DIR
        [--platforms tpu cpu] [--no-bf16] [--cfg-options ...]

The bundle (StableHLO artifact + weights + meta) is loadable with
``omnihd_scenes_tpu.serve.load_exported`` without any model code — the
TPU counterpart of the reference's TensorRT engine export.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('config')
    p.add_argument('checkpoint', help='checkpoint directory (ckpts/)')
    p.add_argument('--out', required=True)
    p.add_argument('--platforms', nargs='+', default=None)
    p.add_argument('--no-bf16', action='store_true')
    p.add_argument('--cfg-options', nargs='+')
    args = p.parse_args()

    import jax

    from omnihd_scenes_tpu.serve import export_model
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.builder import (anchors_for,
                                                 build_model_from_cfg,
                                                 example_batch_for)
    from omnihd_scenes_tpu.train.loop import (create_train_state,
                                              load_checkpoint)
    from omnihd_scenes_tpu.train.optim import (make_lr_schedule,
                                               make_optimizer)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(args.cfg_options)
    model, mtype = build_model_from_cfg(cfg)
    inputs = example_batch_for(model, mtype, cfg)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    # Reconstruct the TrainState leaf structure to restore the ckpt
    # (same pattern as tools/test.py).
    tx = make_optimizer(make_lr_schedule(1e-3, 100, warmup_iters=10))
    state = load_checkpoint(args.checkpoint,
                            create_train_state(variables, tx))
    variables = {'params': state.params,
                 'batch_stats': state.batch_stats}
    out = export_model(model, mtype, variables, inputs, args.out,
                       anchors_np=anchors_for(model, mtype),
                       bf16=not args.no_bf16, platforms=args.platforms)
    print(f'exported bundle -> {out}')


if __name__ == '__main__':
    main()

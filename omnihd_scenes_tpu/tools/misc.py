"""Misc CLI utilities.

Parity targets: ``tools/misc/print_config.py``,
``tools/misc/browse_dataset.py``, ``tools/analysis_tools/get_flops.py``.
(``fuse_conv_bn`` has no analogue: XLA fuses conv+BN at compile time.)
"""

from __future__ import annotations

import argparse

import numpy as np


def print_config(args):
    from omnihd_scenes_tpu.train.config import Config

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    import pprint
    pprint.pprint(cfg.to_dict())


def browse_dataset(args):
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import build_dataset_single
    from omnihd_scenes_tpu.tools.visualize import draw_bev

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    ds = build_dataset_single(cfg.data.train, cfg.get('dataset_type', 'det'))
    import os
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        s = ds[i]
        if 'points' in s:
            pts = s['points'][s['points_mask']]
            gts = s['gt_boxes'][s['gt_mask']] if 'gt_boxes' in s else None
            draw_bev(pts, gts, out=f'{args.out_dir}/sample_{i}.png')
    print(f'wrote {min(args.num, len(ds))} BEV previews to {args.out_dir}')


def get_params(args):
    """Parameter count + per-submodule breakdown (FLOPs come from XLA's
    cost analysis of the jitted forward)."""
    import jax

    from omnihd_scenes_tpu.train.builder import (build_model_from_cfg,
                                                 _model_inputs)
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import build_dataset_single

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    ds = build_dataset_single(cfg.data.val, cfg.get('dataset_type', 'det'))
    model, mtype = build_model_from_cfg(cfg)
    from omnihd_scenes_tpu.train.builder import init_model
    sample = ds[0]
    batch = {k: (v[None] if isinstance(v, np.ndarray) else v)
             for k, v in sample.items()}
    variables = init_model(model, mtype, sample)

    total = 0
    print('Per-submodule parameter counts:')
    for name, sub in variables['params'].items():
        n = sum(x.size for x in jax.tree.leaves(sub))
        total += n
        print(f'  {name:40s} {n / 1e6:8.3f} M')
    print(f'Total params: {total / 1e6:.3f} M')

    fwd = jax.jit(lambda v, **kw: model.apply(v, train=False, **kw))
    lowered = fwd.lower(variables, **_model_inputs(batch, mtype, False))
    try:
        cost = lowered.compile().cost_analysis()
        flops = cost.get('flops', float('nan'))
        print(f'XLA-estimated forward FLOPs: {flops / 1e9:.2f} G')
    except Exception as e:  # cost analysis is backend-dependent
        print(f'(cost analysis unavailable: {e})')


def main():
    p = argparse.ArgumentParser(description='Misc tools')
    sub = p.add_subparsers(dest='task', required=True)
    for name in ('print_config', 'browse_dataset', 'get_params'):
        sp = sub.add_parser(name)
        sp.add_argument('config')
        sp.add_argument('--cfg-options', nargs='+')
        if name == 'browse_dataset':
            sp.add_argument('--out-dir', default='browse_out')
            sp.add_argument('--num', type=int, default=5)
    args = p.parse_args()
    {'print_config': print_config,
     'browse_dataset': browse_dataset,
     'get_params': get_params}[args.task](args)


if __name__ == '__main__':
    main()

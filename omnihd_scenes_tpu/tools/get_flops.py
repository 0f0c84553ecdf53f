"""FLOPs / parameter counter.

Parity target: ``tools/analysis_tools/get_flops.py`` in the reference
(mmcv flops_counter over one forward).  Here XLA does the counting:
``jax.jit(forward).lower(...).cost_analysis()`` reports exact compiled
FLOPs (post-fusion), plus a parameter-count walk over the param tree.

Usage:
    python -m omnihd_scenes_tpu.tools.get_flops CONFIG \
        [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse

import numpy as np


def count(cfg) -> dict:
    import jax

    from omnihd_scenes_tpu.train.builder import (build_model_from_cfg,
                                                 example_batch_for)

    model, mtype = build_model_from_cfg(cfg)
    batch = example_batch_for(model, mtype, cfg)
    variables = model.init(jax.random.PRNGKey(0), *batch, train=False)

    def fwd(params, stats, *args):
        return model.apply({'params': params, 'batch_stats': stats},
                           *args, train=False)

    lowered = jax.jit(fwd).lower(variables['params'],
                                 variables.get('batch_stats', {}), *batch)
    cost = lowered.compile().cost_analysis() or {}
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree.leaves(variables['params']))
    return {
        'model_type': mtype,
        'params': n_params,
        'flops': float(cost.get('flops', float('nan'))),
        'bytes_accessed': float(cost.get('bytes accessed', float('nan'))),
    }


def main():
    p = argparse.ArgumentParser(description='Count FLOPs and params')
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+')
    args = p.parse_args()

    from omnihd_scenes_tpu.train.config import Config

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(args.cfg_options)
    info = count(cfg)
    gf = info['flops'] / 1e9
    print(f"model: {info['model_type']}")
    print(f"params: {info['params'] / 1e6:.2f} M")
    print(f"forward flops: {gf:.2f} GFLOPs (compiled, post-fusion)")
    print(f"hbm bytes/fwd: {info['bytes_accessed'] / 1e6:.1f} MB")


if __name__ == '__main__':
    main()

"""Evaluation CLI.

Parity target: ``tools/test.py`` + ``tools/dist_test.sh`` — load a
config + checkpoint, run sharded inference (streaming recurrence for
BEVFormer), format results to the NewScenes JSON and/or run the devkit
eval (detection + occupancy when present).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a detector')
    p.add_argument('config')
    p.add_argument('checkpoint', help='checkpoint directory (ckpts/)')
    p.add_argument('--eval', action='store_true',
                   help='run the devkit detection eval')
    p.add_argument('--format-only', action='store_true')
    p.add_argument('--out-dir')
    p.add_argument('--int8', action='store_true',
                   help='evaluate the int8 PTQ deployment tier: '
                        'calibrate activation ranges on the first '
                        'val batches, freeze int8 weights, then run '
                        'the quantized graph (models/quant.py)')
    p.add_argument('--bad-conditions', action='store_true',
                   help='evaluate only rainy/night scenes')
    p.add_argument('--host-nms', action='store_true',
                   help='anchor-family serving decode: end the device '
                        'graph at candidate decode and run greedy '
                        'rotated NMS on the host (native C++, '
                        'ops/nms_host.py) — same results, overlaps the '
                        'next batch on a pipelined server')
    p.add_argument('--cfg-options', nargs='+')
    return p.parse_args()


def main():
    from omnihd_scenes_tpu.train.builder import (anchors_for,
                                                 build_model_from_cfg,
                                                 make_predict_fn_generic,
                                                 _model_inputs)
    from omnihd_scenes_tpu.train.config import Config
    from omnihd_scenes_tpu.train.detection import build_dataset_single
    from omnihd_scenes_tpu.train.eval_runner import (
        evaluate_results, run_inference_generic, run_streaming_inference)
    from omnihd_scenes_tpu.train.loop import (create_train_state,
                                              load_checkpoint)
    from omnihd_scenes_tpu.train.optim import make_lr_schedule, make_optimizer

    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    out_dir = args.out_dir or osp.join(cfg.work_dir, 'test')

    mtype_hint = cfg.get('model_type', 'pointpillars')
    dtype = cfg.get('dataset_type', 'det')
    test_cfg = cfg.data.get('test', cfg.data.val)
    dataset = build_dataset_single(test_cfg, dtype)

    model, mtype = build_model_from_cfg(cfg)
    sample = dataset[0]
    if mtype == 'bevformer':
        # Streaming init: single frame + zero prev_bev.
        bev_shape = (model.cfg.bev_h * model.cfg.bev_w,
                     model.cfg.embed_dims)
        variables = model.init(
            jax.random.PRNGKey(0), sample['imgs'], sample['can_bus'],
            sample['lidar2img'], np.zeros(bev_shape, np.float32),
            np.asarray(False),
            method=type(model).forward_stream)
    else:
        from omnihd_scenes_tpu.train.builder import init_model

        variables = init_model(model, mtype, sample)

    # Schedule-based optimizer so the opt-state leaf structure matches
    # the training-side checkpoint exactly.
    tx = make_optimizer(make_lr_schedule(1e-3, 100, warmup_iters=10))
    state = create_train_state(variables, tx)
    state = load_checkpoint(args.checkpoint, state)

    anchors_np = anchors_for(model, mtype)

    quant_vars = None
    if args.int8:
        from omnihd_scenes_tpu.models import quant
        from omnihd_scenes_tpu.train.builder import _model_inputs as _mi

        if mtype == 'bevformer':
            # Calibrate through the streaming forward (cold stream:
            # zero prev_bev) — the queue forward expects a temporal
            # batch the single-frame test dataset doesn't provide.
            def _calib_fn():
                import jax.numpy as jnp

                def fn(v, s):
                    return model.apply(
                        v, s['imgs'], s['can_bus'], s['lidar2img'],
                        jnp.zeros(bev_shape, jnp.float32),
                        jnp.asarray(False), mutable=['quant'],
                        method=type(model).forward_stream)[1]
                return jax.jit(fn)

            def _calib_inputs(sample):
                return {k: sample[k]
                        for k in ('imgs', 'can_bus', 'lidar2img')}
        else:
            def _calib_fn():
                return jax.jit(lambda v, kw: model.apply(
                    v, train=False, mutable=['quant'], **kw)[1])

            def _calib_inputs(sample):
                batch = {k: v[None] for k, v in sample.items()
                         if hasattr(v, 'shape')}
                return _mi(batch, mtype, False)

        def _apply_mutable(variables):
            fn = _calib_fn()
            muts = variables.get('quant', {})
            for i in range(min(4, len(dataset))):       # calib batches
                v = {'params': state.params,
                     'batch_stats': state.batch_stats}
                if muts:
                    v['quant'] = muts
                muts = jax.device_get(fn(v, _calib_inputs(dataset[i]))
                                      )['quant']
                if quant.get_mode() == 'freeze':
                    break                               # one pass enough
            return muts
        quant.set_mode('calib')
        muts = _apply_mutable({})
        quant.set_mode('freeze')
        muts = _apply_mutable({'quant': muts})
        quant_vars = {'quant': muts}
        quant.set_mode('int8')
        print(f'int8 tier: calibrated {len(jax.tree.leaves(muts))} '
              'quant variables')

    if mtype == 'bevformer':
        if args.host_nms:
            print('--host-nms ignored: bevformer decode is NMS-free')
        # Serving preflight: the static SCA query cap silently drops a
        # camera's contribution for overflowing hit queries — exact
        # only while the rig geometry stays under the cap
        # (attention.py; the reference rebatches dynamically and never
        # drops, spatial_cross_attention.py:136-154).  Check every
        # distinct rig in the eval set and fail LOUDLY on overflow.
        if model.cfg.sca_query_cap < 1.0:
            from omnihd_scenes_tpu.models.bevformer.detector import (
                sca_overflow_for_rig)
            # One projection per distinct scene rig (calibration is
            # static within a scene).
            checked = set()
            total_overflow = 0
            for idx in range(len(dataset)):
                scene = dataset.infos[idx].get('scene_token', '')
                if scene in checked:
                    continue
                checked.add(scene)
                ov = sca_overflow_for_rig(model.cfg,
                                          dataset[idx]['lidar2img'])
                total_overflow += ov
            if total_overflow > 0:
                print(f'WARNING: sca_query_cap={model.cfg.sca_query_cap} '
                      f'DROPS {total_overflow} hit queries across '
                      f'{len(checked)} scene rigs — results will NOT '
                      f'match the dense formulation. Raise sca_query_cap '
                      f'(1.0 = exact masked-dense) for this rig.')
        stream_batch = int(cfg.data.get('samples_per_device', 1) or 1)
        if stream_batch > 1:
            from omnihd_scenes_tpu.train.builder import (
                make_predict_stream_batched)
            from omnihd_scenes_tpu.train.eval_runner import (
                run_streaming_inference_batched)

            predict_b = make_predict_stream_batched(
                model, extra_variables=quant_vars)
            bbox_results = run_streaming_inference_batched(
                predict_b, state, dataset, bev_shape, stream_batch,
                model_cfg=model.cfg)
        else:
            predict_stream = make_predict_fn_generic(
                model, mtype, extra_variables=quant_vars)
            probe = None
            if getattr(model.cfg, 'tsa_impl', 'gather') == 'windowed':
                # Checkpoint guard: the windowed TSA dual is exact only
                # while the LEARNED offsets stay in-window; probe on the
                # live stream and fail loudly (see eval_runner).
                from omnihd_scenes_tpu.train.builder import (
                    make_tsa_overflow_probe)
                probe = make_tsa_overflow_probe(
                    model, extra_variables=quant_vars)
            bbox_results = run_streaming_inference(predict_stream, state,
                                                   dataset, bev_shape,
                                                   overflow_probe=probe)
        outputs = {'bbox_results': bbox_results, 'occ_results': None}
    else:
        predict_fn = make_predict_fn_generic(
            model, mtype, anchors_np, extra_variables=quant_vars,
            host_nms=args.host_nms)
        outputs = run_inference_generic(predict_fn, state, dataset,
                                        cfg.data.samples_per_device, mtype)

    if args.format_only:
        path = dataset.format_results(outputs['bbox_results'], out_dir)
        print('Results written to', path)
        return

    if args.eval:
        metrics = evaluate_results(dataset, outputs, cfg.dataroot,
                                   cfg.version, cfg.eval_set, out_dir,
                                   bad_conditions=args.bad_conditions,
                                   verbose=True)
        print(json.dumps(metrics, indent=2))


if __name__ == '__main__':
    main()

"""Benchmark entry: prints ONE JSON line with the headline metric.

Current flagship: full-scale 4D-radar PointPillars inference
(backbone + head + rotated-NMS decode) on synthetic point clouds.
The reference publishes no throughput numbers
(BASELINE.md "Notes"); ``vs_baseline`` is computed against a nominal
60 samples/sec — a PointPillars-class detector on an A100-class GPU —
pending a measured PyTorch reference.
"""

import json
import time

import numpy as np

NOMINAL_A100_SAMPLES_PER_SEC = 60.0


def main():
    import jax

    from omnihd_scenes_tpu.models.anchor_head import (DecodeCfg,
                                                      anchor_head_get_bboxes)
    from omnihd_scenes_tpu.models.detectors import (PointPillars,
                                                    PointPillarsConfig)

    cfg = PointPillarsConfig()
    model = PointPillars(cfg)

    batch = 8
    n_pts = 30000
    rng = np.random.RandomState(0)
    points = rng.uniform(-55, 55, size=(batch, n_pts, 8)).astype(np.float32)
    points[..., 1] = rng.uniform(-38, 38, size=(batch, n_pts))
    points[..., 2] = rng.uniform(-2, 4, size=(batch, n_pts))
    mask = np.ones((batch, n_pts), dtype=bool)

    variables = model.init(jax.random.PRNGKey(0), points[:1], mask[:1],
                           train=False)
    anchors_np = cfg.anchors()
    # Batched anchors as a real argument (unbatched vmap constants hit a
    # slow gather path on this backend).
    anchors_b = np.ascontiguousarray(
        np.broadcast_to(anchors_np[None], (batch,) + anchors_np.shape))
    decode_cfg = DecodeCfg()  # nms_pre=1000, max_num=500

    @jax.jit
    def infer(params, batch_stats, pts, msk, anc):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          pts, msk, train=False)
        return jax.vmap(
            lambda c, b, d, a: anchor_head_get_bboxes(c, b, d, a,
                                                      decode_cfg))(
            out['cls_score'], out['bbox_pred'], out['dir_pred'], anc)

    params, stats = variables['params'], variables.get('batch_stats', {})

    # Warmup / compile.
    res = infer(params, stats, points, mask, anchors_b)
    jax.block_until_ready(res)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        res = infer(params, stats, points, mask, anchors_b)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    samples_per_sec = batch * iters / dt
    print(json.dumps({
        'metric': 'pointpillars_radar_infer_samples_per_sec',
        'value': round(samples_per_sec, 2),
        'unit': 'samples/sec/chip',
        'vs_baseline': round(samples_per_sec / NOMINAL_A100_SAMPLES_PER_SEC,
                             3),
    }))


if __name__ == '__main__':
    main()

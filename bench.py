"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): camera + 4D-radar BEVFusion inference
samples/sec/chip — full production scale (ResNet50, 6 cams at 544x960,
59 LSS depth bins, 30k radar pillars, rotated-NMS decode to 500 boxes).

The reference publishes no throughput numbers (BASELINE.md "Notes");
``vs_baseline`` is computed against a nominal 15 samples/sec — a
BEVFusion-class camera+radar detector on an A100 — pending a measured
PyTorch reference.  The north-star ratio is 2.0 (>= 2x A100).
"""

import json
import time

import numpy as np

NOMINAL_A100_SAMPLES_PER_SEC = 15.0


def main():
    import jax

    from omnihd_scenes_tpu.models.anchor_head import (DecodeCfg,
                                                      anchor_head_get_bboxes)
    from omnihd_scenes_tpu.models.bevfusion import (BEVFusion,
                                                    BEVFusionConfig)

    cfg = BEVFusionConfig()          # full-scale flagship
    model = BEVFusion(cfg)

    batch = 4
    n_pts = 40000
    rng = np.random.RandomState(0)
    points = rng.uniform(-55, 55, size=(batch, n_pts, 8)).astype(np.float32)
    points[..., 1] = rng.uniform(-38, 38, size=(batch, n_pts))
    points[..., 2] = rng.uniform(-2, 4, size=(batch, n_pts))
    mask = np.ones((batch, n_pts), dtype=bool)
    imgs = rng.randn(batch, 6, 544, 960, 3).astype(np.float32)
    rots = np.tile(np.eye(3, dtype=np.float32) * 0.01, (batch, 6, 1, 1))
    trans = np.zeros((batch, 6, 3), np.float32)

    variables = model.init(jax.random.PRNGKey(0), points[:1], mask[:1],
                           imgs[:1], rots[:1], trans[:1], train=False)
    anchors_np = cfg.pillars.anchors()
    anchors_b = np.ascontiguousarray(
        np.broadcast_to(anchors_np[None], (batch,) + anchors_np.shape))
    decode_cfg = DecodeCfg()         # nms_pre=1000, max_num=500

    @jax.jit
    def infer(params, batch_stats, pts, msk, im, r, t, anc):
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          pts, msk, im, r, t, train=False)
        return jax.vmap(
            lambda c, b, d, a: anchor_head_get_bboxes(c, b, d, a,
                                                      decode_cfg))(
            out['cls_score'], out['bbox_pred'], out['dir_pred'], anc)

    params, stats = variables['params'], variables.get('batch_stats', {})

    res = infer(params, stats, points, mask, imgs, rots, trans, anchors_b)
    jax.block_until_ready(res)        # warmup / compile

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        res = infer(params, stats, points, mask, imgs, rots, trans,
                    anchors_b)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    samples_per_sec = batch * iters / dt
    print(json.dumps({
        'metric': 'bevfusion_cam_radar_infer_samples_per_sec',
        'value': round(samples_per_sec, 2),
        'unit': 'samples/sec/chip',
        'vs_baseline': round(samples_per_sec / NOMINAL_A100_SAMPLES_PER_SEC,
                             3),
    }))


if __name__ == '__main__':
    main()

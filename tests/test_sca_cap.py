"""SpatialCrossAttention static query-capacity rebatching.

The capped path (``query_cap < 1``) is the TPU analogue of the
reference's dynamic per-camera rebatching
(``spatial_cross_attention.py:136-154``): it must be exactly equivalent
to the masked dense formulation whenever no camera's hit count exceeds
the cap, and the production rig geometry must actually fit under the
serving cap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.models.bevformer.attention import (
    SpatialCrossAttention, sca_cap_overflow)
from omnihd_scenes_tpu.models.bevformer.encoder import (
    get_reference_points_3d, point_sampling)
from omnihd_scenes_tpu.utils.rig import ring_rig_lidar2img

NQ, C, NCAM, NZ, LEN = 96, 32, 3, 4, 20 * 12
SHAPES = ((20, 12),)


def _inputs(seed=0, hit_frac=0.3):
    rng = np.random.RandomState(seed)
    query = rng.randn(NQ, C).astype(np.float32)
    cam_values = rng.randn(NCAM, LEN, C).astype(np.float32)
    refs = rng.uniform(0, 1, (NCAM, NQ, NZ, 2)).astype(np.float32)
    # Per-camera hit sets of bounded size (<= hit_frac * NQ).
    mask = np.zeros((NCAM, NQ, NZ), bool)
    for cam in range(NCAM):
        hits = rng.choice(NQ, int(NQ * hit_frac), replace=False)
        mask[cam, hits, rng.randint(0, NZ, len(hits))] = True
    return query, cam_values, refs, mask


def _apply(query_cap, variables, inputs):
    mod = SpatialCrossAttention(embed_dims=C, num_cams=NCAM,
                                num_heads=4, num_points=NZ * 2,
                                query_cap=query_cap)
    return mod.apply(variables, *inputs, SHAPES)


@pytest.fixture(scope='module')
def dense_vars():
    inputs = _inputs()
    mod = SpatialCrossAttention(embed_dims=C, num_cams=NCAM,
                                num_heads=4, num_points=NZ * 2)
    return mod.init(jax.random.PRNGKey(0), *inputs, SHAPES)


class TestEquivalence:
    def test_capped_matches_dense_when_no_overflow(self, dense_vars):
        inputs = _inputs(seed=1, hit_frac=0.3)
        assert int(sca_cap_overflow(jnp.asarray(inputs[3]), 0.5)) == 0
        dense = _apply(1.0, dense_vars, inputs)
        capped = _apply(0.5, dense_vars, inputs)
        np.testing.assert_allclose(np.asarray(capped), np.asarray(dense),
                                   atol=2e-5, rtol=1e-4)

    def test_param_tree_identical(self, dense_vars):
        """Capped and dense paths share one checkpoint format."""
        inputs = _inputs()
        mod = SpatialCrossAttention(embed_dims=C, num_cams=NCAM,
                                    num_heads=4, num_points=NZ * 2,
                                    query_cap=0.5)
        capped_vars = mod.init(jax.random.PRNGKey(0), *inputs, SHAPES)
        assert (jax.tree.structure(capped_vars)
                == jax.tree.structure(dense_vars))

    def test_cap_exact_at_hit_count(self, dense_vars):
        """A cap exactly equal to the max hit count is still lossless."""
        inputs = _inputs(seed=2, hit_frac=0.25)
        hit = np.any(inputs[3], -1)
        max_hits = int(hit.sum(1).max())
        cap = max_hits / NQ
        assert int(sca_cap_overflow(jnp.asarray(inputs[3]), cap)) == 0
        dense = _apply(1.0, dense_vars, inputs)
        capped = _apply(cap, dense_vars, inputs)
        np.testing.assert_allclose(np.asarray(capped), np.asarray(dense),
                                   atol=2e-5, rtol=1e-4)

    def test_overflow_counter(self):
        mask = np.zeros((2, 10, 1), bool)
        mask[0, :7] = True          # 7 hits, cap 5 -> 2 dropped
        mask[1, :3] = True          # under cap
        assert int(sca_cap_overflow(jnp.asarray(mask), 0.5)) == 2

    def test_grad_flows_through_capped_path(self, dense_vars):
        inputs = _inputs(seed=3)

        def loss(v):
            return jnp.sum(_apply(0.5, v, inputs) ** 2)

        g = jax.grad(loss)(dense_vars)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_grads_match_dense_when_no_overflow(self, dense_vars):
        """Training under a non-overflowing cap is the same optimization
        problem: parameter gradients equal the dense formulation's."""
        inputs = _inputs(seed=4, hit_frac=0.3)
        assert int(sca_cap_overflow(jnp.asarray(inputs[3]), 0.5)) == 0

        def loss(cap):
            return lambda v: jnp.sum(_apply(cap, v, inputs) ** 2)

        g_dense = jax.grad(loss(1.0))(dense_vars)
        g_cap = jax.grad(loss(0.5))(dense_vars)
        for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_cap)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-4, rtol=1e-3)


class TestProductionGeometry:
    """The serving cap must cover the real rig's hit fractions."""

    def test_omnihd_rig_hit_fraction_under_serving_cap(self):
        bev_h, bev_w, num_z = 160, 240, 4
        pc_range = (-60, -40, -3.0, 60, 40, 5.0)
        l2i = ring_rig_lidar2img(img_hw=(544, 960))
        ref_3d = jnp.asarray(get_reference_points_3d(
            bev_h, bev_w, num_z, pc_range[5] - pc_range[2]))
        _, bev_mask = point_sampling(ref_3d, pc_range,
                                     jnp.asarray(l2i), (544, 960))
        hit = np.asarray(jnp.any(bev_mask, -1))
        frac = hit.sum(1) / hit.shape[1]
        # ~64 deg HFOV cameras on a 120x80 m BEV: each sees < 30%.
        assert frac.max() < 0.30, frac
        # The serving cap (bench.py / MIGRATION.md): 0.375 is lossless.
        assert int(sca_cap_overflow(bev_mask, 0.375)) == 0

    def test_rig_covers_bev(self):
        """Sanity: the ring rig jointly sees most of the BEV."""
        bev_h, bev_w, num_z = 80, 120, 4
        pc_range = (-60, -40, -3.0, 60, 40, 5.0)
        l2i = ring_rig_lidar2img(img_hw=(544, 960))
        ref_3d = jnp.asarray(get_reference_points_3d(
            bev_h, bev_w, num_z, pc_range[5] - pc_range[2]))
        _, bev_mask = point_sampling(ref_3d, pc_range,
                                     jnp.asarray(l2i), (544, 960))
        any_cam = np.asarray(jnp.any(bev_mask, (0, 2)))
        assert any_cam.mean() > 0.7, any_cam.mean()


class TestServingPreflight:
    """VERDICT r3 #7: overflow must be loud in serving; the batched
    streaming mode must refuse oversized batches instead of crashing
    the TPU worker."""

    def test_sca_overflow_for_rig(self):
        from omnihd_scenes_tpu.models.bevformer.detector import (
            BEVFormerConfig, sca_overflow_for_rig)
        l2i = ring_rig_lidar2img(img_hw=(544, 960))
        ok = BEVFormerConfig(sca_query_cap=0.375)
        assert sca_overflow_for_rig(ok, l2i) == 0
        tight = BEVFormerConfig(sca_query_cap=0.05)
        assert sca_overflow_for_rig(tight, l2i) > 0
        # Dense formulation never drops by construction.
        dense = BEVFormerConfig(sca_query_cap=1.0)
        assert sca_overflow_for_rig(dense, l2i) == 0

    def test_hbm_preflight_refuses_oversized_batch(self):
        from omnihd_scenes_tpu.models.bevformer.detector import (
            BEVFormerConfig, check_stream_batch_fits)
        cfg = BEVFormerConfig(sca_query_cap=0.375)
        check_stream_batch_fits(cfg, 2)      # measured to fit (BENCH.md)
        with pytest.raises(ValueError, match='projected to need'):
            check_stream_batch_fits(cfg, 4)  # measured to crash

    def test_batched_runner_preflight(self):
        """run_streaming_inference_batched raises before touching the
        device when given an oversized batch + model_cfg."""
        from omnihd_scenes_tpu.models.bevformer.detector import (
            BEVFormerConfig)
        from omnihd_scenes_tpu.train.eval_runner import (
            run_streaming_inference_batched)

        class _Boom:
            def __len__(self):
                return 8
        with pytest.raises(ValueError, match='projected to need'):
            run_streaming_inference_batched(
                None, None, _Boom(), (16, 4), 4,
                model_cfg=BEVFormerConfig(sca_query_cap=0.375))

"""Parallelism: mesh sharding, distributed helpers, bf16 policy, and
the multichip dryrun on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnihd_scenes_tpu.parallel import (batch_sharding, make_mesh,
                                        shard_batch)
from omnihd_scenes_tpu.parallel.distributed import (barrier, collect_results,
                                                    init_distributed)


class TestMesh:
    def test_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ('data',)

    def test_two_axis_mesh(self):
        mesh = make_mesh(('data', 'model'), shape=(4, 2))
        assert mesh.devices.shape == (4, 2)
        mesh2 = make_mesh(('data', 'model'), shape=(-1, 2))
        assert mesh2.devices.shape == (4, 2)

    def test_shard_batch_places_data(self):
        mesh = make_mesh()
        batch = {'x': np.arange(16, dtype=np.float32).reshape(8, 2)}
        sharded = shard_batch(batch, mesh)
        assert sharded['x'].sharding.is_equivalent_to(
            batch_sharding(mesh), ndim=2)

    def test_psum_gradient_equivalence(self):
        """Data-parallel grads over the mesh == single-device grads."""
        mesh = make_mesh()
        w = jnp.ones((4,)) * 0.5
        x = np.random.RandomState(0).randn(8, 4).astype(np.float32)

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_single = jax.grad(loss)(w, x)
        x_sharded = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        g_sharded = jax.jit(jax.grad(loss))(w, x_sharded)
        assert np.allclose(np.asarray(g_single), np.asarray(g_sharded),
                           atol=1e-6)


class TestDistributedHelpers:
    def test_single_process_identity(self):
        info = init_distributed()
        assert info['process_count'] == 1
        results = [{'a': np.ones(2)}, {'a': np.zeros(2)}]
        assert collect_results(results) == results
        barrier()  # no-op


class TestBF16Policy:
    @pytest.mark.slow
    def test_finite_loss_and_grads(self):
        from omnihd_scenes_tpu.train.amp import bf16_policy
        from omnihd_scenes_tpu.train.detection import make_loss_fn
        from tests.test_pointpillars import TINY
        from omnihd_scenes_tpu.models.detectors import PointPillars

        model = PointPillars(TINY)
        rng = np.random.RandomState(0)
        pts = rng.uniform(-8, 8, (2, 256, 8)).astype(np.float32)
        mask = np.ones((2, 256), bool)
        variables = model.init(jax.random.PRNGKey(0), pts, mask,
                               train=False)
        batch = {
            'points': pts, 'points_mask': mask,
            'gt_boxes': np.tile(np.array(
                [[1.0, 2.0, -0.5, 2.0, 4.0, 1.5, 0.3, 0.0, 0.0]],
                np.float32), (2, 4, 1)),
            'gt_labels': np.zeros((2, 4), np.int32),
            'gt_mask': np.ones((2, 4), bool),
        }
        loss_fn = bf16_policy(make_loss_fn(model))
        (loss, (aux, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables['params'],
                                   variables.get('batch_stats', {}), batch)
        assert np.isfinite(float(loss))
        gn = float(jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))),
            grads, 0.0))
        assert np.isfinite(gn) and gn > 0


class TestGraftEntry:
    def test_dryrun_multichip_cpu(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    @pytest.mark.slow
    def test_dryrun_subset(self):
        import __graft_entry__ as g

        g.dryrun_multichip(4)

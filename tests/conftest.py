"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding/pjit code paths are exercised without TPU hardware, and provide
a session-scoped synthetic NewScenes dataset.

This environment pre-imports jax via an `axon` TPU-tunnel site hook and
pins JAX_PLATFORMS=axon, so plain env-var overrides are too late; we
retarget the (not yet initialized) backend through jax.config instead.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# Persistent compilation cache: compiles dominate suite wall time
# (~6 min cold); warm runs reuse cached executables (~2 min).
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('OMNIHD_TEST_CACHE',
                                 '/tmp/omnihd_jax_cache_cpu'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

import pytest  # noqa: E402


@pytest.fixture(scope='session', autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == 'cpu', (
        'tests must run on the virtual CPU mesh, got '
        f'{jax.devices()}')


@pytest.fixture(scope='session')
def synthetic_dataroot(tmp_path_factory):
    """Generate a small schema-complete synthetic dataset once per session."""
    from omnihd_scenes_tpu.devkit.synthetic import SyntheticConfig, generate

    root = tmp_path_factory.mktemp('newscenes_synth')
    generate(str(root), version='v1.0-mini', cfg=SyntheticConfig())
    return str(root)


@pytest.fixture(scope='session')
def synthetic_db(synthetic_dataroot):
    from omnihd_scenes_tpu.devkit.database import NewScenes

    return NewScenes(version='v1.0-mini', dataroot=synthetic_dataroot,
                     verbose=False)

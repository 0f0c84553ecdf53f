"""Native host-ops library: build, parity with the NumPy path."""

import numpy as np
import pytest

from omnihd_scenes_tpu.data import native
from omnihd_scenes_tpu.data.radar_loading import load_radar_sweep


@pytest.fixture(scope='module')
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip('native library unavailable (no g++?)')
    return lib


class TestNative:
    def test_load_f32_bin(self, lib, tmp_path):
        data = np.arange(24, dtype=np.float32)
        path = tmp_path / 'x.bin'
        data.tofile(path)
        out = np.empty(64, np.float32)
        n = lib.load_f32_bin(str(path).encode(), out, 64)
        assert n == 24
        assert np.array_equal(out[:24], data)

    def test_radar_sweep_parity(self, lib, synthetic_dataroot, synthetic_db,
                                tmp_path):
        """Native decode must match the NumPy reference bit-for-bit-ish."""
        from omnihd_scenes_tpu.devkit.converter import create_newscenes_infos
        import pickle

        out = tmp_path / 'infos'
        create_newscenes_infos(synthetic_dataroot, str(out), 's',
                               version='v1.0-mini', max_sweeps=0)
        with open(out / 's_infos_temporal_train.pkl', 'rb') as f:
            infos = pickle.load(f)['infos']
        sweep = infos[0]['radars']['radar_front'][0]
        ref_ts = int(sweep['timestamp']) * 1e-6

        out_np = load_radar_sweep(sweep, 'radar_front', ref_ts=ref_ts,
                                  use_native=False)
        out_nat = load_radar_sweep(sweep, 'radar_front', ref_ts=ref_ts,
                                   use_native=True)
        assert out_nat.shape == out_np.shape
        assert np.allclose(out_nat, out_np, atol=1e-4), \
            np.abs(out_nat - out_np).max()

    def test_range_crop(self, lib):
        pts = np.array([[0, 0, 0, 9], [100, 0, 0, 9], [1, 2, 3, 9]],
                       np.float32)
        out = native.range_crop_native(pts, [-10, -10, -10], [10, 10, 10])
        assert out.shape == (2, 4)
        assert np.allclose(out[:, 3], 9)

    def test_remap_identity(self, lib):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (8, 10, 3), np.uint8)
        ys, xs = np.meshgrid(np.arange(8, dtype=np.float32),
                             np.arange(10, dtype=np.float32), indexing='ij')
        dst = np.empty_like(img)
        lib.remap_bilinear_u8(np.ascontiguousarray(img), 8, 10, 3,
                              np.ascontiguousarray(xs),
                              np.ascontiguousarray(ys), dst)
        # Identity map: interior pixels identical, border row/col may
        # read out of bounds for the +1 tap.
        assert np.array_equal(dst[:7, :9], img[:7, :9])


class TestPrefetch:
    def test_order_and_completion(self):
        from omnihd_scenes_tpu.data.prefetch import prefetch

        items = list(prefetch(iter(range(20)), buffer_size=4))
        assert items == list(range(20))

    def test_error_propagates(self):
        from omnihd_scenes_tpu.data.prefetch import prefetch

        def gen():
            yield 1
            raise ValueError('boom')

        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(ValueError):
            list(it)

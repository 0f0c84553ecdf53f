"""Samplers, dataset wrappers, and the multi-process worker pool."""

import numpy as np
import pytest

from omnihd_scenes_tpu.data.loader import TrainLoader
from omnihd_scenes_tpu.data.sampling import (CBGSDataset,
                                             ClassBalancedDataset,
                                             ConcatDataset, RepeatDataset,
                                             group_shuffled_order,
                                             wrap_dataset)


class ToyDataset:
    """Index-identifiable samples with per-sample class content."""

    classes = ('car', 'pedestrian', 'rider', 'large_vehicle')

    def __init__(self, n=20, rare_every=10):
        self.infos = []
        for i in range(n):
            names = ['car']
            if i % rare_every == 0:
                names.append('rider')
            self.infos.append({'gt_names': np.array(names)})

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, idx):
        return {'idx': np.array([idx], np.int64),
                'x': np.full((3,), float(idx), np.float32)}


def test_group_shuffled_order_batches_are_group_pure():
    flags = np.array([0] * 7 + [1] * 5)
    order = group_shuffled_order(flags, 4, np.random.RandomState(0))
    assert len(order) % 4 == 0
    for i in range(0, len(order), 4):
        batch_flags = flags[order[i:i + 4]]
        assert len(set(batch_flags.tolist())) == 1
    # Every index appears at least once.
    assert set(order.tolist()) == set(range(12))


def test_repeat_and_concat():
    ds = ToyDataset(5)
    rep = RepeatDataset(ds, 3)
    assert len(rep) == 15
    assert int(rep[7]['idx'][0]) == 2
    cat = ConcatDataset([ToyDataset(3), ToyDataset(4)])
    assert len(cat) == 7
    assert int(cat[5]['idx'][0]) == 2       # second dataset, local idx 2
    assert cat.classes == ToyDataset.classes


def test_class_balanced_oversamples_rare():
    ds = ToyDataset(20, rare_every=10)      # rider in 2/20 samples
    cb = ClassBalancedDataset(ds, oversample_thr=0.5)
    idx = cb.indices
    rare = sum(1 for i in idx if i % 10 == 0)
    # Rare samples repeated ~sqrt(0.5/0.1) ~ 2.2x each.
    assert rare >= 4
    assert len(cb) > len(ds)


def test_cbgs_balances_classes():
    ds = ToyDataset(20, rare_every=10)
    cbgs = CBGSDataset(ds, seed=0)
    idx = cbgs.indices
    rare_frac = np.mean([i % 10 == 0 for i in idx])
    # car:20 + rider:2 samples -> target 11 draws per class; rider draws
    # all come from the 2 rare samples.
    assert rare_frac > 0.3
    assert wrap_dataset(ds, {'type': 'CBGSDataset'}).indices.shape == \
        idx.shape


@pytest.mark.slow
def test_worker_pool_ordered_and_matches_inline():
    ds = ToyDataset(13)
    loader = TrainLoader(ds, batch_size=4, seed=1, num_workers=2)
    try:
        batches = list(loader)
    finally:
        loader.close()
    ref = list(TrainLoader(ds, batch_size=4, seed=1))
    assert len(batches) == len(ref)
    for b, r in zip(batches, ref):
        np.testing.assert_array_equal(b['idx'], r['idx'])
        np.testing.assert_array_equal(b['x'], r['x'])


class BadDataset(ToyDataset):
    """Module-level so spawn workers can unpickle it."""

    def __getitem__(self, idx):
        if idx == 3:
            raise ValueError('boom')
        return super().__getitem__(idx)


def test_worker_pool_propagates_errors():
    loader = TrainLoader(BadDataset(6), batch_size=2, shuffle=False,
                         num_workers=1)
    try:
        with pytest.raises(RuntimeError, match='boom'):
            list(loader)
    finally:
        loader.close()


def test_group_flags_in_loader():
    ds = ToyDataset(10)
    flags = np.array([0] * 6 + [1] * 4)
    loader = TrainLoader(ds, batch_size=2, seed=0, group_flags=flags)
    seen = []
    for batch in loader:
        idxs = batch['idx'][:, 0]
        gf = flags[idxs]
        assert len(set(gf.tolist())) == 1
        seen.extend(idxs.tolist())
    assert set(seen) == set(range(10))
    assert len(loader) == 5


def test_worker_pool_discards_stale_generation():
    """Abandoning an iteration mid-way must not leak its in-flight
    results into the next iteration (regression: seq collisions
    silently delivered wrong samples)."""
    from omnihd_scenes_tpu.data.worker_pool import WorkerPool

    ds = ToyDataset(32)
    pool = WorkerPool(ds, num_workers=2, window=8)
    try:
        it = pool.imap(range(32))
        for _ in range(3):                 # consume a few, abandon rest
            next(it)
        del it
        got = [s['idx'][()] if hasattr(s['idx'], 'shape') else s['idx']
               for s in pool.imap(range(16, 24))]
        assert [int(g) for g in got] == list(range(16, 24))
    finally:
        pool.close()


def test_worker_pool_decorrelates_rng():
    from omnihd_scenes_tpu.data.worker_pool import WorkerPool

    ds = RngDataset()
    pool = WorkerPool(ds, num_workers=2, window=4)
    try:
        vals = list(pool.imap(range(8)))
    finally:
        pool.close()
    # With 2 workers sharing one pickled RandomState the two draw
    # streams would be identical; distinct per-worker seeds make the
    # full multiset of draws distinct with overwhelming probability.
    assert len({round(float(v), 9) for v in vals}) == len(vals)


class RngDataset:
    """Module-level so spawn workers can unpickle it."""

    def __init__(self):
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return 100

    def __getitem__(self, idx):
        return self.rng.rand()

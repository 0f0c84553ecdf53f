"""Ragged-safe multi-host result collection (simulated 3-host gather)."""

import numpy as np

from omnihd_scenes_tpu.parallel.distributed import (_pad_local,
                                                    collect_results)


def _make_results(rank, n):
    return [{'token': np.array([rank * 100 + i]),
             'boxes': np.full((4, 9), rank * 100 + i, np.float32)}
            for i in range(n)]


def _fake_allgather_factory(host_locals):
    """Build per-host allgather fns that stack every host's padded
    contribution, mirroring multihost_utils.process_allgather."""
    counts = [len(h) for h in host_locals]
    max_n = max(counts)
    keys = sorted(host_locals[0][0].keys())

    def allgather(x):
        if isinstance(x, np.ndarray):          # the counts gather
            return np.stack([np.asarray([c], np.int64) for c in counts])
        padded = [_pad_local(h, keys, max_n) for h in host_locals]
        return {k: np.stack([p[k] for p in padded]) for k in x}

    return allgather


def test_ragged_counts_rank_ordered():
    host_locals = [_make_results(0, 5), _make_results(1, 3),
                   _make_results(2, 4)]
    allgather = _fake_allgather_factory(host_locals)

    for rank in range(3):
        out = collect_results(host_locals[rank], _allgather=allgather,
                              _process_count=3)
        assert len(out) == 12
        tokens = [int(r['token'][0]) for r in out]
        assert tokens == ([0, 1, 2, 3, 4] + [100, 101, 102]
                          + [200, 201, 202, 203])
        for r in out:
            assert r['boxes'].shape == (4, 9)
            assert float(r['boxes'][0, 0]) == float(r['token'][0])


def test_total_size_trims_wrap_padding():
    host_locals = [_make_results(0, 4), _make_results(1, 4)]
    allgather = _fake_allgather_factory(host_locals)
    out = collect_results(host_locals[0], total_size=7,
                          _allgather=allgather, _process_count=2)
    assert len(out) == 7


def test_single_process_identity():
    res = _make_results(0, 3)
    assert collect_results(res) == res

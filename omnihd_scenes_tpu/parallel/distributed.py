"""Multi-host initialization and result collection.

Parity targets:
- ``init_dist`` (mmcv NCCL process groups, reference ``tools/train.py:
  179-186``) -> ``jax.distributed.initialize`` (a no-op single-host);
- ``collect_results_cpu`` (per-rank pickles to a tmpdir + barrier +
  rank-0 ordered concat, reference ``apis/test.py:119-163``) ->
  ``multihost_utils.process_allgather`` over in-memory arrays — the
  filesystem IPC dance disappears.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Dict[str, int]:
    """Initialize multi-host JAX if requested via args or env.

    Single-process usage needs no initialization; multi-host runs
    (GKE/TPU pods) either auto-detect or take explicit coordinates.
    """
    if coordinator_address or os.environ.get('COORDINATOR_ADDRESS'):
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ['COORDINATOR_ADDRESS'],
            num_processes=num_processes
            or int(os.environ.get('NUM_PROCESSES', '1')),
            process_id=process_id
            or int(os.environ.get('PROCESS_ID', '0')))
    return {'process_index': jax.process_index(),
            'process_count': jax.process_count(),
            'local_devices': jax.local_device_count(),
            'global_devices': jax.device_count()}


def _pad_local(local_results: List[Dict[str, np.ndarray]],
               keys: List[str], max_n: int) -> Dict[str, np.ndarray]:
    """Stack a host's results per key and zero-pad to ``max_n`` rows."""
    local = {k: np.stack([np.asarray(r[k]) for r in local_results])
             for k in keys}
    n = len(local_results)
    if n < max_n:
        local = {k: np.concatenate(
            [v, np.zeros((max_n - n,) + v.shape[1:], v.dtype)])
            for k, v in local.items()}
    return local


def collect_results(local_results: List[Dict[str, np.ndarray]],
                    total_size: Optional[int] = None,
                    _allgather=None,
                    _process_count: Optional[int] = None) -> List[Dict]:
    """Gather per-host result lists into a rank-ordered global list.

    Hosts shard the eval set in contiguous blocks (EvalLoader order);
    rank-ordered concatenation reproduces the reference's tmpdir-pickle
    collection semantics (``apis/test.py:119-163``).  Ragged-safe: hosts
    may hold different result counts (the tail shard is shorter) — each
    host zero-pads to the global max before the allgather and padding
    is dropped per-rank by the gathered counts.  Identity on a single
    process.  ``_allgather``/``_process_count`` are injectable for
    multi-host simulation in tests.
    """
    process_count = (_process_count if _process_count is not None
                     else jax.process_count())
    if process_count == 1:
        return list(local_results)

    if _allgather is None:
        from jax.experimental import multihost_utils

        _allgather = multihost_utils.process_allgather

    counts = np.asarray(
        _allgather(np.asarray([len(local_results)], np.int64))
    ).reshape(process_count)
    max_n = int(counts.max())
    if counts.min() == 0:
        # Raise on EVERY host (counts are identical everywhere): a
        # one-host assert before the payload allgather would leave the
        # other hosts blocked in the collective forever.
        raise RuntimeError(
            f'collect_results: some host holds zero results '
            f'(counts={counts.tolist()}); shard the eval set so every '
            'host gets at least one sample')
    keys = sorted(local_results[0].keys())
    gathered = _allgather(_pad_local(local_results, keys, max_n))
    out: List[Dict] = []
    for rank in range(process_count):
        for i in range(int(counts[rank])):
            out.append({k: gathered[k][rank, i] for k in keys})
    if total_size is not None:
        out = out[:total_size]
    return out


def barrier(name: str = 'barrier') -> None:
    """Cross-host sync (reference dist.barrier, apis/test.py:141)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)

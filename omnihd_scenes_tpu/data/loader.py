"""Host-side batching: shuffled training batches and rank-contiguous
eval sharding.

Parity targets: the reference's ``DistributedGroupSampler``
(shuffled, padded training sampler, ``samplers/group_sampler.py:61-104``)
and the contiguous-block ``DistributedSampler``
(``samplers/distributed_sampler.py:35-37``) whose per-rank temporal
continuity the streaming BEVFormer eval depends on.  Here "ranks" are
data-parallel shards of one host batch; multi-host keeps the same
contiguous-block rule per process.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np


def _stack(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class TrainLoader:
    """Epoch-shuffled, padded batch iterator (drop_last=False)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 shuffle: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # Pad to a full final batch by wrapping (reference group sampler
        # pads with repeated indices).
        pad = (-n) % self.batch_size
        order = np.concatenate([order, order[:pad]])
        for i in range(0, len(order), self.batch_size):
            idxs = order[i:i + self.batch_size]
            yield _stack([self.dataset[int(j)] for j in idxs])


class EvalLoader:
    """Contiguous-block eval iterator.

    Keeps temporally adjacent samples in the same shard position so a
    streaming (stateful) model sees each scene in order, mirroring the
    reference's contiguous DistributedSampler.  Yields (batch, valid)
    where ``valid`` marks real (non-padded) samples.
    """

    def __init__(self, dataset, batch_size: int):
        self.dataset = dataset
        self.batch_size = batch_size

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        num_batches = len(self)
        per_slot = num_batches  # contiguous block per batch slot
        for b in range(num_batches):
            samples, valid = [], []
            for slot in range(self.batch_size):
                idx = slot * per_slot + b
                if idx < n:
                    samples.append(self.dataset[idx])
                    valid.append(True)
                else:
                    samples.append(self.dataset[n - 1])  # pad with last
                    valid.append(False)
            yield _stack(samples), np.asarray(valid)

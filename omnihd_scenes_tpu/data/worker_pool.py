"""Multi-process sample preparation.

Parity target: the reference's DataLoader worker processes
(``workers_per_gpu=4``, ``datasets/builder.py:72-103``) — six-image
undistort + radar decode per sample is host-CPU bound and must overlap
device compute.  This pool owns N ``spawn`` worker processes (fork is
unsafe once the TPU client exists), streams sample indices to them
through a task queue, and yields prepared samples *in submission
order* with a bounded in-flight window (bounded memory, unlike
``Pool.imap`` whose result buffer can grow without limit when the
consumer stalls).

NOTE: spawn re-imports ``__main__`` in each worker — caller scripts
must guard their entry point with ``if __name__ == '__main__':`` (the
shipped CLIs do).
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Dict, Iterable, Iterator, Optional

import numpy as np


def _worker_main(dataset, worker_id, task_q, result_q):
    # Decorrelate augmentation RNG per worker: all spawn workers
    # receive the same pickled dataset state (same RandomState), which
    # would give every worker an identical augmentation-parameter
    # stream (the classic fork-seed bug the reference avoids with
    # worker_init_fn seeding).
    if hasattr(dataset, 'rng') and isinstance(dataset.rng,
                                              np.random.RandomState):
        base = dataset.rng.randint(0, 2 ** 31 - 1)
        dataset.rng = np.random.RandomState(base + worker_id)
    np.random.seed((np.random.randint(0, 2 ** 31 - 1) + worker_id)
                   % (2 ** 31 - 1))
    while True:
        item = task_q.get()
        if item is None:
            return
        gen, seq, idx = item
        try:
            result_q.put((gen, seq, dataset[int(idx)], None))
        except BaseException as e:  # surface in the parent
            result_q.put((gen, seq, None, f'{type(e).__name__}: {e}'))


class WorkerPool:
    """Ordered, bounded, multi-process index->sample map."""

    def __init__(self, dataset, num_workers: int, window: int = 16):
        assert num_workers > 0
        ctx = mp.get_context('spawn')
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._window = max(window, 2 * num_workers)
        self._gen = 0
        self._procs = [
            ctx.Process(target=_worker_main,
                        args=(dataset, wid, self._task_q, self._result_q),
                        daemon=True)
            for wid in range(num_workers)]
        for p in self._procs:
            p.start()

    def imap(self, indices: Iterable[int]) -> Iterator:
        """Yield ``dataset[i]`` for each i, in order.

        Each call starts a new generation: results of an abandoned or
        failed earlier iteration still in flight are discarded by tag
        instead of being misdelivered into the new epoch.
        """
        self._gen += 1
        gen = self._gen
        it = iter(indices)
        pending: Dict[int, object] = {}
        submitted = 0
        consumed = 0
        exhausted = False
        while True:
            while not exhausted and submitted - consumed < self._window:
                try:
                    idx = next(it)
                except StopIteration:
                    exhausted = True
                    break
                self._task_q.put((gen, submitted, int(idx)))
                submitted += 1
            if consumed == submitted and exhausted:
                return
            while consumed not in pending:
                rgen, seq, sample, err = self._result_q.get()
                if rgen != gen:
                    continue                  # stale: prior iteration
                if err is not None:
                    raise RuntimeError(f'data worker failed: {err}')
                pending[seq] = sample
            yield pending.pop(consumed)
            consumed += 1

    def close(self):
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._procs = []

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""Worker process for the real 2-process ``jax.distributed`` test.

Launched by ``tests/test_distributed_multiprocess.py`` (never imported
by pytest itself): each worker joins a 2-process CPU cluster through
the repo's ``init_distributed`` env path, runs the sharded-eval result
collection with RAGGED per-rank counts, and rank 0 writes a JSON
verdict.  This is the live-cluster counterpart of the injected-fake
tests in ``tests/test_collect_results.py`` (reference semantics:
``apis/test.py:119-163`` rank-ordered tmpdir-pickle collection).
"""

import json
import os
import sys


def main():
    out_path = sys.argv[1]

    import jax

    # The axon site hook pins JAX_PLATFORMS=axon (single TPU chip);
    # retarget the not-yet-initialized backend to CPU.
    jax.config.update('jax_platforms', 'cpu')

    from omnihd_scenes_tpu.parallel.distributed import (barrier,
                                                        collect_results,
                                                        init_distributed)

    # Env path: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID set by
    # the launcher (the repo's equivalent of mmcv init_dist env wiring).
    info = init_distributed()
    assert info['process_count'] == int(os.environ['NUM_PROCESSES']), info
    pid = info['process_index']

    import numpy as np

    # Ragged shard sizes: rank 0 holds 3 results, rank 1 holds 2 (the
    # tail shard of a 5-sample eval split over 2 hosts).
    n_local = 3 - pid
    local = [{'boxes': np.full((2, 3), 10 * pid + i, np.float32),
              'sample_idx': np.asarray([10 * pid + i], np.int64)}
             for i in range(n_local)]

    merged = collect_results(local, total_size=5)
    barrier('after-collect')

    if pid == 0:
        idx = [int(r['sample_idx'][0]) for r in merged]
        boxes_ok = all(
            bool((r['boxes'] == r['sample_idx'][0]).all()) for r in merged)
        json.dump({'ok': idx == [0, 1, 2, 10, 11] and boxes_ok,
                   'idx': idx, 'count': len(merged),
                   'process_count': info['process_count'],
                   'global_devices': info['global_devices']},
                  open(out_path, 'w'))


if __name__ == '__main__':
    main()

#!/usr/bin/env bash
# Parity wrapper for the reference tools/dist_train.sh.
# JAX is single-controller: one process drives every local device, so
# no torch.distributed.launch equivalent is needed.  Multi-host TPU
# pods set COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID per host
# (see omnihd_scenes_tpu/parallel/distributed.py) and run this script
# on each host.
CONFIG=$1
shift
python -m omnihd_scenes_tpu.tools.train "$CONFIG" "$@"

#!/usr/bin/env bash
# Parity wrapper for the reference tools/dist_test.sh (see dist_train.sh).
CONFIG=$1
CKPT=$2
shift 2
python -m omnihd_scenes_tpu.tools.test "$CONFIG" "$CKPT" "$@"

#!/usr/bin/env bash
# Multi-process training launcher — the TPU-native counterpart of the
# reference's tools/dist_train.sh (torch.distributed.launch, reference
# tools/dist_train.sh:1-9). One JAX process per host; each process sees its
# local chips and jax.distributed.initialize() wires the collectives over
# ICI/DCN. On a Cloud TPU pod the runtime starts one process per host for
# you, so NPROCS is usually the number of *local* processes to spawn when
# simulating multi-host on a single machine (CPU: combine with
# JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count).
#
#   tools/dist_train.sh CONFIG NPROCS [train.py args...]
#   PORT=43412 tools/dist_train.sh configs/cffm_b1_vspw_160k.py 2 --work-dir /tmp/w

set -euo pipefail

CONFIG=$1
NPROCS=$2
shift 2
PORT=${PORT:-43412}

if [ "$NPROCS" -le 1 ]; then
    exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
fi

pids=()
for ((i = 0; i < NPROCS; i++)); do
    python "$(dirname "$0")/train.py" "$CONFIG" --distributed \
        --coordinator "127.0.0.1:$PORT" --num-processes "$NPROCS" \
        --process-id "$i" "$@" &
    pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
    wait "$pid" || rc=$?
done
exit $rc

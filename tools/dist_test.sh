#!/usr/bin/env bash
# Multi-process evaluation launcher — counterpart of the reference's
# tools/dist_test.sh (reference tools/dist_test.sh:1-9). Each process
# evaluates a video shard; the per-process confusion matrices are summed
# via process_allgather (eval/metrics.py), replacing the pickle gather.
#
#   tools/dist_test.sh CONFIG CHECKPOINT NPROCS [test.py args...]

set -euo pipefail

CONFIG=$1
CHECKPOINT=$2
NPROCS=$3
shift 3
PORT=${PORT:-29822}

if [ "$NPROCS" -le 1 ]; then
    exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
fi

pids=()
for ((i = 0; i < NPROCS; i++)); do
    python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --distributed \
        --coordinator "127.0.0.1:$PORT" --num-processes "$NPROCS" \
        --process-id "$i" "$@" &
    pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
    wait "$pid" || rc=$?
done
exit $rc

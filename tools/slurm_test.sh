#!/usr/bin/env bash
# Slurm evaluation launcher — TPU-native counterpart of the reference's
# tools/slurm_test.sh (srun + --launcher=slurm, reference
# tools/slurm_test.sh:1-25). One task per TPU host; tools/test.py shards the
# video list across processes and aggregates the confusion matrix with a
# process allgather.
#
#   tools/slurm_test.sh PARTITION CONFIG CHECKPOINT [test.py args...]

set -euo pipefail

PARTITION=$1
CONFIG=$2
CHECKPOINT=$3
shift 3
JOB_NAME=${JOB_NAME:-vss_cffm_eval}
NTASKS=${NTASKS:-4}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
PORT=${PORT:-43413}
SRUN_ARGS=${SRUN_ARGS:-}
TOOLS_DIR=$(cd "$(dirname "$0")" && pwd)

PYTHONPATH="$TOOLS_DIR/..":${PYTHONPATH:-} \
srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --ntasks="$NTASKS" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS_PER_TASK" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    bash -c "exec python -u '$TOOLS_DIR/test.py' \"\$@\" --distributed \
        --coordinator \"\$(scontrol show hostnames \"\$SLURM_JOB_NODELIST\" | head -n1):$PORT\" \
        --num-processes \"\$SLURM_NTASKS\" --process-id \"\$SLURM_PROCID\"" \
    _ "$CONFIG" "$CHECKPOINT" "$@"

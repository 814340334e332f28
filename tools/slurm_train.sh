#!/usr/bin/env bash
# Slurm training launcher — TPU-native counterpart of the reference's
# tools/slurm_train.sh (srun + --launcher=slurm, reference
# tools/slurm_train.sh:1-23). One task per TPU host; each task derives its
# process id / world size / coordinator from the Slurm environment and
# joins the cluster via jax.distributed.initialize (tools/train.py
# --distributed).
#
#   tools/slurm_train.sh PARTITION CONFIG [train.py args...]
#   NTASKS=4 CPUS_PER_TASK=8 tools/slurm_train.sh tpu configs/cffm_b1_vspw_160k.py

set -euo pipefail

PARTITION=$1
CONFIG=$2
shift 2
JOB_NAME=${JOB_NAME:-vss_cffm}
NTASKS=${NTASKS:-4}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
PORT=${PORT:-43412}
SRUN_ARGS=${SRUN_ARGS:-}
TOOLS_DIR=$(cd "$(dirname "$0")" && pwd)

# srun exports SLURM_PROCID/SLURM_NTASKS/SLURM_JOB_NODELIST per task; the
# coordinator is the first node of the allocation.
PYTHONPATH="$TOOLS_DIR/..":${PYTHONPATH:-} \
srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --ntasks="$NTASKS" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS_PER_TASK" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    bash -c "exec python -u '$TOOLS_DIR/train.py' \"\$@\" --distributed \
        --coordinator \"\$(scontrol show hostnames \"\$SLURM_JOB_NODELIST\" | head -n1):$PORT\" \
        --num-processes \"\$SLURM_NTASKS\" --process-id \"\$SLURM_PROCID\"" \
    _ "$CONFIG" "$@"

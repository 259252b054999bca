#!/usr/bin/env bash
# Slurm eval launcher (tools/slurm_test.sh analog): srun one process per
# host; jax.distributed picks coordinates from SLURM_* env automatically.
set -euo pipefail
PARTITION=$1; JOB_NAME=$2; PRESET=$3; CKPT=$4; shift 4
NODES=${NODES:-1}
srun -p "$PARTITION" --job-name="$JOB_NAME" --nodes="$NODES" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python -m transcar_tpu.cli.test "$PRESET" "$CKPT" "$@"

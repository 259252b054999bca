#!/usr/bin/env bash
# Multi-host eval launcher (tools/dist_test.sh analog).
#
# Single host: ./tools/dist_test.sh <preset> <checkpoint> [args...]
# Multi-host (one process per host): set the jax.distributed env first —
#   JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$RANK \
#   ./tools/dist_test.sh <preset> <checkpoint> --format-only [args...]
# Samples stride across processes; rank 0 writes the submission json
# (multi_gpu_test + collect analog).
set -euo pipefail
PRESET=$1; CKPT=$2; shift 2
if [[ -n "${JAX_COORDINATOR:-}" ]]; then
  export JAX_COORDINATOR_ADDRESS=$JAX_COORDINATOR
fi
exec python -m transcar_tpu.cli.test "$PRESET" "$CKPT" "$@"

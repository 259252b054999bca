#!/usr/bin/env bash
# Multi-host training launcher (tools/dist_train.sh analog).
#
# Single host: all local TPU chips form the data mesh automatically —
#   ./tools/dist_train.sh <preset> [args...]
# Multi-host (one process per host): set the jax.distributed env first —
#   JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$RANK \
#   ./tools/dist_train.sh <preset> [args...]
set -euo pipefail
PRESET=$1; shift
if [[ -n "${JAX_COORDINATOR:-}" ]]; then
  export JAX_COORDINATOR_ADDRESS=$JAX_COORDINATOR
fi
exec python -m transcar_tpu.cli.train "$PRESET" "$@"

#!/bin/bash
# Round-5 chip measurement queue — one TPU process at a time, in order.
# Each job in its own process (a worker fault must not poison the next).
#   setsid nohup bash scripts/run_r5_chip_queue.sh > /tmp/r5_queue.log 2>&1 \
#       < /dev/null & disown
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"

run() {
  local name="$1"; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout 7200 "$@" 2>&1
  echo "=== [$name] done rc=$? $(date -u +%H:%M:%S) ==="
}

run pillar   python scripts/bench_objdgcnn.py --preset pillar --parts infer,train
run voxel    python scripts/bench_objdgcnn.py --preset voxel  --parts infer,train
run multistep python scripts/run_multistep_tpu.py
run augtest  python scripts/bench_aug_test.py
echo "QUEUE COMPLETE $(date -u +%H:%M:%S)"

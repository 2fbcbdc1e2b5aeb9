#!/usr/bin/env bash
# Round-5 stage 2 TPU queue: regression with the noisy-observation protocol,
# the dense/exact GP scaling arm, then the 5-type x 5-seed flagship BO
# breadth sweep.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"

echo "=== regression(noise) start $(date +%T) ==="
timeout 7200 python -m graphgp_tpu.cli.regression \
  --walks 1 4 16 64 256 1024 2048 4096 8192 --gnn-baseline \
  >> "$LOG/regression.log" 2>&1
echo "=== regression exit $? $(date +%T) ==="

echo "=== scaling_dense start $(date +%T) ==="
timeout 3600 python -m graphgp_tpu.cli.scaling --exact-only \
  --sizes 32 64 128 256 512 1024 \
  --results-dir artifacts/results/scaling_dense \
  >> "$LOG/scaling_dense.log" 2>&1
echo "=== scaling_dense exit $? $(date +%T) ==="

bash benchmarks/round5_bo_breadth.sh

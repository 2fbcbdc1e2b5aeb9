#!/usr/bin/env bash
# Round-5 sequential protocol queue (one TPU chip — jobs must not overlap).
# Each stanza appends to its own log; failures fall through to the next job.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"
CORA=/root/reference/experiments/dense/cora/data/cora

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%T) ==="
  timeout "$tmo" "$@" >> "$LOG/$name.log" 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}

# Cora small split: 140 train / 1000 test / M=50, GRF wpn=4096
# (reference classification_multiple_GRF_small.ipynb cells 4+8)
run cora_small 3600 python -m graphgp_tpu.cli.classification \
  --cora-dir "$CORA" --walks-per-node 4096 --num-steps 1000 --seeds 5 \
  --small-train 140 --num-test 1000 --num-inducing 50 \
  --results-dir artifacts/results/cora_small

# Cora small split, exact-diffusion kernel
# (classification_multiple_diff_small.ipynb)
run cora_exact_small 3600 python -m graphgp_tpu.cli.classification \
  --cora-dir "$CORA" --num-steps 1000 --seeds 5 \
  --kernel-kind exact_diffusion \
  --small-train 140 --num-test 1000 --num-inducing 50 \
  --results-dir artifacts/results/cora_exact_small

# Cora full split, exact-diffusion kernel under RobustMax
# (classification_multiple_diff.ipynb)
run cora_exact 3600 python -m graphgp_tpu.cli.classification \
  --cora-dir "$CORA" --num-steps 1000 --seeds 5 \
  --kernel-kind exact_diffusion \
  --results-dir artifacts/results/cora_exact

# Traffic-protocol convergence sweep to wpn=8192: GRF meets the exact floor
# (reference traffic_regression.ipynb cells 20-22)
run regression 7200 python -m graphgp_tpu.cli.regression \
  --walks 1 4 16 64 256 1024 2048 4096 8192 --gnn-baseline

# Wind sweep at reference depth: wpn 32..8192, 1000 Adam steps, both kernels
# (reference wind_experiment.py:30-43)
run wind 7200 python -m graphgp_tpu.cli.wind \
  --walks 32 64 128 256 512 1024 2048 4096 8192 \
  --train-steps 1000

echo "=== queue done $(date +%T) ==="

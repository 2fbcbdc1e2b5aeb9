#!/bin/bash
# Protocol sweep runner: executes every reference experiment protocol on the
# TPU chip, sequentially (one device), continuing past failures. Results land
# in artifacts/results/*.csv (stable names committed; timestamped copies
# gitignored), logs in artifacts/logs/.
#
# Protocols (BASELINE.md / SURVEY.md §6):
#   regression      traffic-style GRF→exact convergence, 900-node grid
#   regression-pems same on the offline PEMS-like highway graph
#   ablation        principled vs ad-hoc load, 30×30 mesh
#   classification  Cora SVGP 7-class (real graphml), full + small splits
#   wind            sphere-grid wind interpolation (synthetic ERA5 stand-in)
#   scaling         RW sampling + sparse GP scaling over graph sizes
#   bo              regret curves: synthetic grids (incl. 1e6 flagship) + SNAP
#   hmc             NUTS-style posterior over kernel hyperparameters
cd "$(dirname "$0")/.." || exit 1
mkdir -p artifacts/logs artifacts/results

# Dataset roots — override for checkouts without the reference tree mounted.
# GraphDataLoader resolves its own root (GRAPHGP_DATA_ROOT or known
# defaults); CORA_DIR feeds the classification CLI's --cora-dir flag.
REF_ROOT="${GRAPHGP_REFERENCE_ROOT:-/root/reference}"
CORA_DIR="${GRAPHGP_CORA_DIR:-$REF_ROOT/experiments/dense/cora/data/cora}"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python -u -m "$@" >"artifacts/logs/$name.log" 2>&1
  local rc=$?
  tail -3 "artifacts/logs/$name.log" | grep -v WARNING
  echo "--- $name rc=$rc"
}

run ablation        3600 graphgp_tpu.cli.ablation
run regression      5400 graphgp_tpu.cli.regression --graph-type grid --n-nodes 900 --gnn-baseline
run regression_pems 5400 graphgp_tpu.cli.regression --graph-type pems_like \
  --results-dir artifacts/results/pems
run wind            3600 graphgp_tpu.cli.wind
run classification  7200 graphgp_tpu.cli.classification \
  --cora-dir "$CORA_DIR" \
  --walks-per-node 4096 --num-steps 1000 --seeds 5
run classification_small 3600 graphgp_tpu.cli.classification \
  --cora-dir "$CORA_DIR" \
  --walks-per-node 4096 --num-steps 1000 --seeds 5 --small-train 140 \
  --results-dir artifacts/results/cora_small
# full reference span 2^5..2^20 (run_scaling_experiment.py:62-77): dense-vs-
# sparse RW at 2^5..2^10, iterative GP through the 1e6 flagship, exact <=1024
run scaling        10800 graphgp_tpu.cli.scaling --sizes 32 64 128 256 512 1024 \
  2048 4096 8192 16384 32768 65536 131072 262144 524288 1048576 \
  --gp-sizes 32 64 128 256 512 1024 4096 16384 65536 262144 1048576
run hmc             3600 graphgp_tpu.cli.hmc
run bo_small        5400 graphgp_tpu.cli.bo --graph-type grid --n-nodes 4096 \
  --iterations 30 --runs 3 --walks-per-node 500
run bo_facebook     5400 graphgp_tpu.cli.bo --graph-type facebook \
  --iterations 30 --runs 2 --walks-per-node 1000 --gaussianize \
  --algorithms random_search bfs grf_thompson \
  --results-dir artifacts/results/bo_facebook
run bo_flagship    10800 graphgp_tpu.cli.bo --graph-type grid --n-nodes 1000000 \
  --iterations 20 --runs 3 --walks-per-node 1000 \
  --algorithms random_search bfs grf_thompson \
  --results-dir artifacts/results/bo_1m
# multichip scaling-efficiency harness runs on the virtual CPU mesh
run multichip 3600 graphgp_tpu.cli.multichip --force-cpu
echo "ALL DONE $(date +%H:%M:%S)"

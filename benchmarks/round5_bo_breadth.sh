#!/usr/bin/env bash
# Flagship BO breadth: 5 synthetic graph types x 5 seeds x 3 algorithms at
# 1e6 nodes (reference protocol: run_bo.py:29-50 BO_SEEDS=100+10i,
# run_all_graphs.py:10-77 graph list; algorithms random/bfs/sparse_grf as in
# run_bo.py:95). One sweep per type, per-cell subprocess isolation.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/logs
mkdir -p "$LOG"

for gt in grid periodic_grid staircase_grid circle grid_multimodal; do
  echo "=== bo_1m $gt start $(date +%T) ==="
  # Non-isolated: one process per graph type — the 1e6-node step matrices
  # upload through the tunnel ONCE per type instead of once per cell
  # (isolated cells each paid ~2-5 min of H2D; a TPU worker crash now costs
  # at most this type's remaining cells, recorded as error rows).
  timeout 7200 python -m graphgp_tpu.cli.bo \
    --graph-type "$gt" --n-nodes 1000000 \
    --iterations 50 --runs 5 \
    --initial-points 100 --batch-size 100 \
    --walks-per-node 1000 --max-walk-length 5 \
    --learning-rate 0.01 --train-epochs 40 --gp-retrain-interval 1000 \
    --algorithms random_search bfs grf_thompson \
    --results-dir "artifacts/results/bo_1m_$gt" \
    >> "$LOG/bo_1m_$gt.log" 2>&1
  echo "=== bo_1m $gt exit $? $(date +%T) ==="
done
echo "=== bo breadth done $(date +%T) ==="

"""Bayesian-optimization driver loop.

Re-design of reference ``BayesianOptimizer.run_optimization``
(experiments/graph_bo/utils/bo_utils.py:293-348): random initial design,
iterate select→evaluate→update, record best value / regret / batch stats per
iteration.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np

from .algorithms import Algorithm


@dataclasses.dataclass
class BOResult:
    records: List[Dict]
    observed_idx: np.ndarray
    observed_y: np.ndarray

    def best_values(self) -> np.ndarray:
        return np.asarray([r["best_value"] for r in self.records])

    def regrets(self) -> np.ndarray:
        return np.asarray([r["regret"] for r in self.records])


def run_optimization(
    algorithm: Algorithm,
    objective_values: np.ndarray,
    *,
    n_iterations: int,
    initial_points: int = 10,
    batch_size: int = 1,
    seed: Optional[int] = None,
    verbose: bool = False,
) -> BOResult:
    objective_values = np.asarray(objective_values, dtype=np.float32).ravel()
    n_nodes = objective_values.shape[0]
    rng = np.random.default_rng(seed)
    # keep the algorithm's own rng aligned with the loop seed for
    # reproducibility (reference seeds np.random globally, bo_utils.py:300)
    algorithm.rng = rng
    gt_best = float(objective_values.max())

    observed_idx = rng.choice(n_nodes, size=initial_points, replace=False).astype(
        np.int64
    )
    observed_y = objective_values[observed_idx]
    best_value = float(observed_y.max())
    best_idx = int(observed_idx[np.argmax(observed_y)])
    algorithm.update(observed_idx, observed_y)

    records: List[Dict] = []
    for iteration in range(n_iterations):
        t0 = time.time()
        next_idx = algorithm.select_next_points(observed_idx, observed_y, batch_size)
        batch_values = objective_values[np.asarray(next_idx, dtype=np.int64)]
        for ix, val in zip(next_idx, batch_values):
            if float(val) > best_value:
                best_value = float(val)
                best_idx = int(ix)
        observed_idx = np.concatenate([observed_idx, np.asarray(next_idx, np.int64)])
        observed_y = objective_values[observed_idx]
        algorithm.update(observed_idx, observed_y)
        records.append(
            {
                "iteration": iteration + 1,
                "best_value": best_value,
                "best_point": best_idx,
                "regret": gt_best - best_value,
                "dataset_size": int(observed_idx.size),
                "batch_mean": float(np.mean(batch_values)),
                "batch_max": float(np.max(batch_values)),
                "iter_seconds": time.time() - t0,
            }
        )
        if verbose:
            print(
                f"  iter {iteration + 1}/{n_iterations}: best={best_value:.4f} "
                f"regret={gt_best - best_value:.4f} n={observed_idx.size}"
            )
    return BOResult(records=records, observed_idx=observed_idx, observed_y=observed_y)

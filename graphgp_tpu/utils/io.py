"""Results I/O and observability: CSV results with timestamped copies,
summaries, and metric helpers.

Mirrors the reference's results conventions (reference
experiments/graph_bo/utils/io.py:90-145, bo_utils/io_utils.py:5-54: stable
CSV + timestamped copy + config JSON snapshot + groupby summary)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def save_results(
    records: List[Dict],
    results_dir: str,
    name: str,
    config: Optional[Dict] = None,
) -> str:
    """Write records to ``<name>.csv`` plus a timestamped copy and a config
    snapshot. Returns the stable CSV path."""
    import pandas as pd

    os.makedirs(results_dir, exist_ok=True)
    df = pd.DataFrame(records)
    stable = os.path.join(results_dir, f"{name}.csv")
    df.to_csv(stable, index=False)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    df.to_csv(os.path.join(results_dir, f"{name}_{stamp}.csv"), index=False)
    if config is not None:
        with open(os.path.join(results_dir, f"{name}_config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    return stable


def summarize_results(
    records: List[Dict], group_keys: Sequence[str], value_keys: Sequence[str]
):
    """Groupby mean/std summary (reference print_summary, io.py:128-145)."""
    import pandas as pd

    df = pd.DataFrame(records)
    present = [k for k in value_keys if k in df.columns]
    return df.groupby(list(group_keys))[present].agg(["mean", "std"])


def print_summary(records: List[Dict], group_keys: Sequence[str], value_keys: Sequence[str]):
    summary = summarize_results(records, group_keys, value_keys)
    print(summary.to_string())
    return summary


def compute_fro(k_est: np.ndarray, k_ref: np.ndarray) -> float:
    """Relative Frobenius distance between kernel matrices (reference
    utils.py:32-38)."""
    k_est = np.asarray(k_est)
    k_ref = np.asarray(k_ref)
    return float(np.linalg.norm(k_est - k_ref) / np.linalg.norm(k_ref))

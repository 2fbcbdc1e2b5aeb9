"""One config layer for library + drivers: dataclass with YAML loading.

Unifies the reference's three coexisting config styles (SURVEY §5.6: argparse
flags, JSON Config class, YAML→flattened-dict→dataclass at
experiments/graph_bo/utils/config_loader.py:6-120) into a single dataclass
whose fields cover all drivers. Nested YAML sections are flattened; unknown
keys error loudly instead of being silently dropped.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class ExperimentConfig:
    """Shared experiment configuration (superset of the reference's fields,
    config_loader.py:6-58)."""

    # experiment selection (empty = driver's single --graph-type is used)
    datasets: List[str] = field(default_factory=list)
    algorithms: List[str] = field(
        default_factory=lambda: ["random_search", "bfs", "grf_thompson"]
    )

    # BO parameters
    iterations: int = 10
    runs: int = 3
    initial_points: int = 100
    batch_size: int = 50
    seeds: List[int] = field(default_factory=list)

    # graph / GRF parameters
    n_nodes: int = 1024
    graph_type: str = "ring"
    walks_per_node: int = 1000
    p_halt: float = 0.1
    max_walk_length: int = 3
    kernel_kind: str = "free"  # 'free' | 'diffusion'

    # training parameters
    learning_rate: float = 0.01
    train_epochs: int = 30
    gp_retrain_interval: int = 300
    cg_tol: float = 1e-2
    cg_max_iters: int = 100
    num_probes: int = 16
    num_pathwise_samples: int = 64

    # directories
    step_matrices_dir: str = "artifacts/step_matrices"
    results_dir: str = "artifacts/results"

    # seeds
    random_walk_seed: int = 42

    def __post_init__(self):
        if len(self.seeds) != self.runs:
            # reference convention: seeds 100, 110, 120, ... (config_loader.py:44)
            self.seeds = [100 + 10 * i for i in range(self.runs)]
        os.makedirs(self.step_matrices_dir, exist_ok=True)
        os.makedirs(self.results_dir, exist_ok=True)


# YAML section → dataclass-field mapping. Fields may appear at top level or
# under their section header.
_SECTIONS = {
    "bo_parameters": [
        "iterations", "runs", "initial_points", "batch_size", "seeds",
    ],
    "grf_parameters": [
        "walks_per_node", "p_halt", "max_walk_length", "kernel_kind",
        "n_nodes", "graph_type",
    ],
    "training_parameters": [
        "learning_rate", "train_epochs", "gp_retrain_interval", "cg_tol",
        "cg_max_iters", "num_probes", "num_pathwise_samples",
    ],
    "directories": {"step_matrices": "step_matrices_dir", "results": "results_dir"},
    "random_seeds": ["random_walk_seed"],
}


def load_config_from_yaml(path: str) -> ExperimentConfig:
    import yaml

    if not os.path.exists(path):
        raise FileNotFoundError(f"configuration file not found: {path}")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    known_fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    out: Dict[str, Any] = {}

    for key, value in raw.items():
        if key in _SECTIONS:
            spec = _SECTIONS[key]
            if isinstance(spec, dict):
                for yk, fk in spec.items():
                    if yk in value:
                        out[fk] = value[yk]
                extra = set(value) - set(spec)
            else:
                for fk in spec:
                    if fk in value:
                        out[fk] = value[fk]
                extra = set(value) - set(spec)
            if extra:
                raise ValueError(f"unknown keys {sorted(extra)} in section {key!r}")
        elif key in known_fields:
            out[key] = value
        else:
            raise ValueError(f"unknown config key {key!r}")
    return ExperimentConfig(**out)


def to_dict(cfg: ExperimentConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


# argparse dest → ExperimentConfig field, where the names differ
_DEST_ALIASES = {
    "cache_dir": "step_matrices_dir",
    "seed": "random_walk_seed",
    "kind": "kernel_kind",
}


def argparse_defaults_from_config(cfg: ExperimentConfig, parser) -> Dict[str, Any]:
    """Map a loaded config onto a driver's argparse defaults.

    Drivers call ``parser.set_defaults(**argparse_defaults_from_config(...))``
    before parsing, so explicit CLI flags still override YAML values — the
    reference's YAML→ExperimentConfig flow (config_loader.py:61-115) with
    flag-level override on top.
    """
    out: Dict[str, Any] = {}
    for action in parser._actions:
        dest = action.dest
        field = _DEST_ALIASES.get(dest, dest)
        if hasattr(cfg, field):
            out[dest] = getattr(cfg, field)
    return out


def add_config_flag(parser) -> None:
    parser.add_argument(
        "--config", default=None, metavar="YAML",
        help="YAML ExperimentConfig; CLI flags override its values",
    )


def enable_compilation_cache(path=None) -> None:
    """Persistent XLA compilation cache shared across processes.

    Cold-start compiles dominate driver startup at the flagship shapes
    (measured: the N=1e6 ELL→stencil conversion is ~39 s of compile and
    ~4 s of work; verified the cache works through the remote TPU compile:
    22.5 s → 0.29 s across processes). Opt out with
    GRAPHGP_NO_COMPILE_CACHE=1; relocate with GRAPHGP_COMPILE_CACHE=path.
    """
    import os

    if os.environ.get("GRAPHGP_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = path or os.environ.get(
            "GRAPHGP_COMPILE_CACHE", "artifacts/jax_cache"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # never let cache plumbing break a driver


def parse_with_config(parser, argv):
    """Two-stage parse: peek at --config, fold it into defaults, re-parse.
    Also enables the persistent compilation cache for every driver."""
    enable_compilation_cache()
    pre_args, _ = parser.parse_known_args(argv)
    cfg = None
    if getattr(pre_args, "config", None):
        cfg = load_config_from_yaml(pre_args.config)
        parser.set_defaults(**argparse_defaults_from_config(cfg, parser))
    return parser.parse_args(argv), cfg

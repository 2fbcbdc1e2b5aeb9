"""Config, I/O, metrics, profiling utilities."""

from .config import ExperimentConfig, load_config_from_yaml, to_dict
from .io import compute_fro, print_summary, save_results, summarize_results
from .profiling import PhaseTimer, jax_trace, memory_mb, walks_per_second

"""Profiling & observability: phase timers, throughput counters, and
jax.profiler trace capture.

Upgrade over the reference's ad-hoc time.time() brackets + psutil RSS
accounting (SURVEY §5.1, run_scaling_experiment.py:331-359)."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates named wall-clock phases; prints a one-line summary."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (time.time() - t0)

    def summary(self) -> str:
        return " | ".join(f"{k}={v:.2f}s" for k, v in self.phases.items())


def walks_per_second(num_nodes: int, walks_per_node: int, seconds: float) -> float:
    return num_nodes * walks_per_node / max(seconds, 1e-12)


def memory_mb() -> Optional[float]:
    try:
        import psutil

        return psutil.Process().memory_info().rss / 1e6
    except Exception:
        return None


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict:
    """Per-device HBM stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out

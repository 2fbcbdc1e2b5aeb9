"""Bayesian optimization over graph nodes with GRF-GP surrogates."""

from .algorithms import BFS, DFS, GreedySearch, GRFThompson, RandomSearch
from .loop import BOResult, run_optimization

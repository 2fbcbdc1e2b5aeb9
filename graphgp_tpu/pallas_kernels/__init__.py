"""Pallas TPU kernels for the hot ops.

These are the hand-scheduled fast paths; every kernel has a pure-XLA
reference implementation elsewhere in the package (walker.py, features.py)
that it is tested against bit-for-bit (RNG) / to f32 tolerance (accumulation
order).
"""
from .walker import sample_dense_step_matrices_pallas  # noqa: F401

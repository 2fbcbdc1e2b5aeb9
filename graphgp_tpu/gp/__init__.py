"""GP inference on GRF graph kernels: exact (Cholesky), iterative (CG+SLQ,
pathwise conditioning), variational (SVGP), and HMC hyperparameter posteriors."""

from . import exact, hmc, iterative, params, spectral, svgp
from .iterative import CGSettings, pathwise_predict, summarize_samples

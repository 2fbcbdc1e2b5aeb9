"""graphgp_tpu — TPU-native Graph Random Feature Gaussian processes.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MatthewZhang473/Efficient-Gaussian-Process-on-Graphs: importance-sampled
random-walk graph random features (GRFs), modulated step-matrix kernels, and
scalable GP inference (exact Cholesky for small N; CG + stochastic Lanczos
quadrature with pathwise-conditioning prediction for large N), sharded over
TPU meshes.
"""

from .graphs import (
    CsrGraph,
    PackedGraph,
    csr_graph,
    generate_noisy_samples,
    laplacian,
    normalized_laplacian,
    normalized_laplacian_csr,
    pack_csr,
    pack_dense,
    pack_laplacian,
    packed_to_dense,
)
from .kernels import (
    diffusion_kernel,
    fast_diffusion_grf_kernel,
    fast_general_grf_kernel,
    feature_matrix_kernel,
    general_pofm_feature_matrix,
    gram_from_phi,
    grf_kernel_unbiased,
    step_matrices_for_adjacency,
)
from .features import (
    DenseFeatures,
    EllFeatures,
    LogFeatures,
    StencilFeatures,
    ell_to_stencil,
)
from .modulators import diffusion_modulator, free_modulator_init, geometric_modulator
from .pipeline import blocked_ell_features
from .walker import (
    WalkConfig,
    WalkLog,
    dense_step_matrices,
    fused_phi,
    sample_dense_step_matrices,
    sample_walk_log,
)

__version__ = "0.1.0"

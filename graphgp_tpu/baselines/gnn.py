"""Graph-convolutional network regression baseline.

Counterpart of the reference's Keras graph-conv baseline
(experiments/dense/traffic_dataset/traffic_regression_GNN.ipynb): a small GCN
(Kipf-Welling propagation ``Â H W`` with Â = D̂^{-1/2}(A+I)D̂^{-1/2}) trained
with masked MSE on observed nodes. Pure JAX/optax; all compute is dense
matmuls → MXU-friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def gcn_propagation_matrix(adj) -> jnp.ndarray:
    """Â = D̂^{-1/2} (A + I) D̂^{-1/2} (dense)."""
    import scipy.sparse as sp

    a = adj.toarray() if sp.issparse(adj) else np.asarray(adj)
    a = a + np.eye(a.shape[0])
    d = a.sum(1)
    dinv = 1.0 / np.sqrt(d)
    return jnp.asarray(a * dinv[:, None] * dinv[None, :], jnp.float32)


def init_gcn(
    key: jax.Array, in_dim: int, hidden: Sequence[int] = (64, 64)
) -> Dict:
    dims = [in_dim, *hidden, 1]
    params = {}
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        params[f"w{i}"] = jax.random.normal(sub, (a, b)) * jnp.sqrt(2.0 / a)
        params[f"b{i}"] = jnp.zeros((b,))
    return params


def gcn_forward(params: Dict, a_hat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = x
    n_layers = len(params) // 2
    for i in range(n_layers):
        h = a_hat @ h @ params[f"w{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h[:, 0]


@dataclasses.dataclass
class GCNResult:
    params: Dict
    losses: jnp.ndarray
    predictions: jnp.ndarray  # (N,) full-graph predictions


def fit_gcn(
    adj,
    train_idx: jnp.ndarray,
    y_train: jnp.ndarray,
    *,
    node_features: Optional[jnp.ndarray] = None,
    hidden: Sequence[int] = (64, 64),
    learning_rate: float = 1e-2,
    num_steps: int = 500,
    key: Optional[jax.Array] = None,
) -> GCNResult:
    """Train a GCN regressor; without explicit node features it uses random
    positional features (fixed by key), which graph convolutions smooth into
    structure-aware representations."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k_feat, k_init = jax.random.split(key)
    a_hat = gcn_propagation_matrix(adj)
    n = a_hat.shape[0]
    x = (
        node_features
        if node_features is not None
        else jax.random.normal(k_feat, (n, 32), jnp.float32) * 0.1
    )
    params = init_gcn(k_init, x.shape[1], hidden)
    opt = optax.adam(learning_rate)

    @jax.jit
    def run(p0):
        def step(carry, _):
            p, state = carry
            loss, grads = jax.value_and_grad(
                lambda q: jnp.mean(
                    (gcn_forward(q, a_hat, x)[train_idx] - y_train) ** 2
                )
            )(p)
            updates, state = opt.update(grads, state, p)
            return (optax.apply_updates(p, updates), state), loss

        (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), None, length=num_steps)
        return p, losses

    trained, losses = run(params)
    return GCNResult(
        params=trained,
        losses=losses,
        predictions=gcn_forward(trained, a_hat, x),
    )

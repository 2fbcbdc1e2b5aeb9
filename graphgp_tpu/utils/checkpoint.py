"""Hyperparameter / variational-state checkpointing.

The reference has no model checkpoint/resume (SURVEY §5.4: only pickle caches
of step matrices); this adds orbax-backed checkpoints of learned parameter
pytrees (kernel hyperparameters, variational state, optimizer state), with an
npz fallback for flat dict params.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional


def save_params(path: str, params: Any) -> None:
    """Save a parameter pytree. Uses orbax when available, else npz for flat
    dicts of arrays."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    import numpy as np

    if not isinstance(params, dict):
        raise TypeError("npz fallback supports flat dict params only")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Load a parameter pytree saved by :func:`save_params`. ``like`` provides
    the target structure/dtypes for orbax restoration."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            import jax

            targets = jax.tree_util.tree_map(
                lambda x: ocp.utils.to_shape_dtype_struct(x), like
            )
            return ckptr.restore(path, targets)
        return ckptr.restore(path)
    import jax.numpy as jnp
    import numpy as np

    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}

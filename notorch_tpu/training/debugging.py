"""Numerical debugging helpers.

The TPU analog of the reference's (absent) sanitizer story (SURVEY §5):
JAX's functional purity plus NaN checking and finite-ness assertions.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Raise on the first NaN produced inside jitted code."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side check that every array leaf is finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            arr = np.asarray(leaf)
            if not np.isfinite(arr).all():
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def grad_norm(grads) -> float:
    """Global L2 norm of a gradient pytree (for logging/clipping checks)."""
    leaves = [jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)]
    return float(jnp.sqrt(sum(leaves)))

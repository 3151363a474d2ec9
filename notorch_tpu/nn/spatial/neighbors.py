"""Static-shape radius-graph neighbor search.

The reference calls torch_cluster's C++/CUDA ``radius_graph`` inside the
forward pass (reference schnet.py:41, gvp/conv.py:118), producing a dynamic
edge set. The TPU form: masked pairwise distances + per-node top-K under a
fixed max-degree budget — shapes are static, the result is a padded neighbor
list ``[N, K]`` + validity mask. Padding points sit at coordinates 1e9, so
they fall outside every radius.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radius_neighbors(
    coords: jnp.ndarray,  # [N, 3]
    batch_index: jnp.ndarray,  # [N] i32
    radius: float,
    max_neighbors: int,
    loop: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(neighbors [N, K] i32, mask [N, K] bool, dists [N, K])``.

    Neighbor slots beyond the true degree are masked; if more than K points
    fall inside the radius the *nearest* K are kept (torch_cluster keeps an
    arbitrary subset — nearest-K is strictly more deterministic).
    """
    N = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    d2 = (diff**2).sum(-1)
    same = batch_index[:, None] == batch_index[None, :]
    ok = same & (d2 <= radius**2)
    if not loop:
        ok = ok & ~jnp.eye(N, dtype=bool)
    big = jnp.asarray(jnp.inf, d2.dtype)
    masked = jnp.where(ok, d2, big)
    neg, idx = jax.lax.top_k(-masked, max_neighbors)  # nearest K
    d2_k = -neg
    mask = jnp.isfinite(d2_k)
    dists = jnp.sqrt(jnp.where(mask, d2_k, 0.0))
    return idx.astype(jnp.int32), mask, dists

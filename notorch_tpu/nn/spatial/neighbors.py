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
    window: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns ``(neighbors [N, K] i32, mask [N, K] bool, dists [N, K])``.

    Neighbor slots beyond the true degree are masked; if more than K points
    fall inside the radius the *nearest* K are kept (torch_cluster keeps an
    arbitrary subset — nearest-K is strictly more deterministic).

    ``window``: the BANDED fast path. Batched molecular clouds lay each
    molecule's atoms contiguously (``pad_point_clouds``), so every
    same-molecule pair sits within ``max_cloud_size - 1`` positions of each
    other in the flat array — candidates outside the band cannot be
    neighbors. With ``window=W`` (valid whenever every cloud has at most
    ``W + 1`` atoms) the distance work drops from O(N^2) to O(N * (2W+1)):
    ~40x less at QM9 scale, identical results (parity-tested).
    """
    N = coords.shape[0]
    if window is not None and 2 * window + 1 < N:
        W = int(window)
        offs = jnp.arange(-W, W + 1)  # [2W+1]
        cand = jnp.arange(N)[:, None] + offs[None, :]  # [N, 2W+1]
        cand_safe = jnp.clip(cand, 0, N - 1)
        # band via STATIC shifted slices of sentinel-padded arrays — the
        # [N, 2W+1] dynamic gather form lowered to a scatter-class op and
        # measured SLOWER than the O(N^2) path (round-5 probe); slices are
        # free relayouts. Out-of-range slots carry batch sentinel -1 (never
        # equal to a real batch id or the padding id), so no in_range mask
        # is needed.
        cpad = jnp.concatenate(
            [jnp.full((W, 3), 1e9, coords.dtype), coords,
             jnp.full((W, 3), 1e9, coords.dtype)], axis=0,
        )
        bpad = jnp.concatenate(
            [jnp.full((W,), -1, batch_index.dtype), batch_index,
             jnp.full((W,), -1, batch_index.dtype)], axis=0,
        )
        cwin = jnp.stack([cpad[k : k + N] for k in range(2 * W + 1)], axis=1)
        bwin = jnp.stack([bpad[k : k + N] for k in range(2 * W + 1)], axis=1)
        d2 = ((coords[:, None, :] - cwin) ** 2).sum(-1)
        same = batch_index[:, None] == bwin
        ok = same & (d2 <= radius**2)
        if not loop:
            ok = ok & (offs != 0)[None, :]
        big = jnp.asarray(jnp.inf, d2.dtype)
        masked = jnp.where(ok, d2, big)
        neg, pos = jax.lax.top_k(-masked, max_neighbors)
        d2_k = -neg
        mask = jnp.isfinite(d2_k)
        idx = jnp.take_along_axis(cand_safe, pos, axis=1)
        # masked slots may point anywhere in the band; pin them to 0 so the
        # result is deterministic regardless of the clamp layout
        idx = jnp.where(mask, idx, 0)
        dists = jnp.sqrt(jnp.where(mask, d2_k, 0.0))
        return idx.astype(jnp.int32), mask, dists

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
    idx = jnp.where(mask, idx, 0)
    return idx.astype(jnp.int32), mask, dists

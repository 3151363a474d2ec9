"""Segment reductions — the TPU replacement for torch_scatter.

The reference's message passing and readout are built on torch_scatter's
C++/CUDA ``scatter_{sum,mean,max,softmax}`` (reference
``notorch/nn/gnn/chemprop.py:39,86``, ``notorch/nn/gnn/agg.py:27-84``). Here
they are XLA ``segment_sum``-family ops with **static** ``num_segments`` so
everything stays jittable; the Pallas fused kernels in
``notorch_tpu.kernels`` override the hot path.

Padding convention (see ``notorch_tpu.data.graph``): padding elements carry a
segment id one past the real range, so reductions need no masks — callers
simply ignore the trailing "trash" row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_min",
    "segment_softmax",
    "segment_reduce",
]


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    totals = segment_sum(data, segment_ids, num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones(segment_ids.shape, dtype=data.dtype), segment_ids, num_segments=num_segments
    )
    return totals / jnp.maximum(counts, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Max-reduce; empty segments yield 0 (torch_scatter fills lowest, but an
    empty segment is always padding here, so 0 keeps downstream math finite)."""
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def segment_min(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isposinf(out), 0.0, out)


def segment_softmax(
    scores: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Numerically stable softmax within each segment.

    ``mask`` (optional, bool over elements) excludes elements from both the
    max and the normalizer; masked elements get weight 0.
    """
    if mask is not None:
        scores = jnp.where(_expand(mask, scores), scores, -jnp.inf)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(_expand(mask, exp), exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments)
    return exp / jnp.maximum(denom, 1e-12)[segment_ids]


def _expand(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return mask.reshape(mask.shape + (1,) * (like.ndim - mask.ndim))


_REDUCERS = {
    "sum": segment_sum,
    "mean": segment_mean,
    "max": segment_max,
    "min": segment_min,
}


def segment_reduce(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, reduce: str = "sum"
) -> jnp.ndarray:
    """Dispatch on the reference's ``Reduction`` literal (types.py:57)."""
    try:
        fn = _REDUCERS[reduce]
    except KeyError:
        raise ValueError(f"unknown reduction {reduce!r}; expected one of {list(_REDUCERS)}")
    return fn(data, segment_ids, num_segments)

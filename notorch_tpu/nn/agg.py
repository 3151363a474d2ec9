"""Per-graph readout (pooling) over the batched graph.

Capability parity: reference ``notorch/nn/gnn/agg.py:15-86`` (Sum/Mean/Max/
Gated/SDPAttention over ``batch_node_index``). Segment ids of padding nodes
point at the trailing trash slot, which is sliced off, so no masking is
needed; ``Mean``'s denominators come out right for the same reason.

``psum_axis``: when the batch's *nodes* are sharded over a mesh axis
(molecule-granularity graph partitioning, ``notorch_tpu.parallel``), each
shard holds a disjoint subset of nodes labeled with GLOBAL graph ids; the
local segment reduction is combined across shards with one ``psum`` of the
[G, d] per-graph partials — the only cross-shard traffic of the whole
molecule-partitioned forward (O(G·d) per step vs the replicated scheme's
O(V·d) per layer).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph
from notorch_tpu.nn.ops import segment_max, segment_sum

__all__ = ["Sum", "Mean", "Max", "Gated", "SDPAttention"]


def _num_segments(G: BatchedGraph) -> int:
    return G.n_graphs + 1  # + trash slot for padding


class Sum(nn.Module):
    psum_axis: str | None = None

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        out = segment_sum(G.node_feats, G.node_graph, _num_segments(G))[: G.n_graphs]
        if self.psum_axis is not None:
            out = jax.lax.psum(out, self.psum_axis)
        return out


class Mean(nn.Module):
    psum_axis: str | None = None

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        n = _num_segments(G)
        totals = segment_sum(G.node_feats, G.node_graph, n)[: G.n_graphs]
        counts = segment_sum(
            G.node_mask.astype(G.node_feats.dtype), G.node_graph, n
        )[: G.n_graphs]
        if self.psum_axis is not None:
            # combine partial sums AND partial counts so graphs that straddle
            # shards average over their true global node count
            totals = jax.lax.psum(totals, self.psum_axis)
            counts = jax.lax.psum(counts, self.psum_axis)
        return totals / jnp.maximum(counts, 1.0)[:, None]


class Max(nn.Module):
    psum_axis: str | None = None

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        if self.psum_axis is None:
            return segment_max(G.node_feats, G.node_graph, _num_segments(G))[: G.n_graphs]
        # keep -inf for locally-empty segments until after the cross-shard
        # max, else an all-padding shard would clamp the true max at 0.
        # all_gather+max instead of pmax: pmax has no differentiation rule,
        # while all_gather transposes cleanly (and XLA lowers this pattern to
        # the same collective cost).
        out = jax.ops.segment_max(
            G.node_feats, G.node_graph, num_segments=_num_segments(G)
        )[: G.n_graphs]
        out = jax.lax.all_gather(out, self.psum_axis).max(axis=0)
        return jnp.where(jnp.isneginf(out), 0.0, out)


class Gated(nn.Module):
    """Learned softmax-attention pooling (reference agg.py:50-63)."""

    input_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32
    psum_axis: str | None = None

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        scores = nn.Dense(1, dtype=self.dtype, name="a")(G.node_feats).squeeze(-1)
        alpha = _segment_softmax_sharded(
            scores, G.node_graph, _num_segments(G), G.node_mask, self.psum_axis
        )
        weighted = alpha[:, None] * G.node_feats
        out = segment_sum(weighted, G.node_graph, _num_segments(G))[: G.n_graphs]
        if self.psum_axis is not None:
            out = jax.lax.psum(out, self.psum_axis)
        return out


class SDPAttention(nn.Module):
    """Query-conditioned scaled-dot-product pooling (reference agg.py:66-86).

    ``Q`` is the per-graph query ``[b, d]`` (wire it from any upstream module
    via in_keys); when omitted — the ``aggregation="sdp"`` factory path — a
    learned query vector is broadcast to every graph (a 1-token
    cross-attention readout)."""

    key_dim: int = DEFAULT_HIDDEN_DIM
    psum_axis: str | None = None

    @nn.compact
    def __call__(
        self, G: BatchedGraph, Q: jnp.ndarray | None = None,
        training: bool = False, **kwargs
    ) -> jnp.ndarray:
        if Q is None:
            d = G.node_feats.shape[-1]
            q = self.param("query", nn.initializers.lecun_normal(), (1, d))
            Q = jnp.broadcast_to(q, (G.n_graphs, d)).astype(G.node_feats.dtype)
        # Q: [b, d] per-graph queries; trash slot gets a zero query
        q_full = jnp.concatenate([Q, jnp.zeros_like(Q[:1])], axis=0)
        scores = (q_full[G.node_graph] * G.node_feats).sum(-1) / jnp.sqrt(float(self.key_dim))
        alpha = _segment_softmax_sharded(
            scores, G.node_graph, _num_segments(G), G.node_mask, self.psum_axis
        )
        weighted = alpha[:, None] * G.node_feats
        out = segment_sum(weighted, G.node_graph, _num_segments(G))[: G.n_graphs]
        if self.psum_axis is not None:
            out = jax.lax.psum(out, self.psum_axis)
        return out


def _segment_softmax_sharded(scores, segment_ids, num_segments, mask, psum_axis):
    """Segment softmax whose max and normalizer span all shards of a node-
    sharded batch (pmax of segment maxima, psum of segment normalizers), so
    gated/SDP pooling stays exact when a graph straddles shards."""
    from notorch_tpu.nn.ops import segment_softmax

    if psum_axis is None:
        return segment_softmax(scores, segment_ids, num_segments, mask=mask)
    scores = jnp.where(mask, scores, -jnp.inf)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    # the max shift is for numerical stability only — the softmax value is
    # invariant to it, so stop_gradient keeps AD exact (pmax has no AD rule)
    seg_max = jax.lax.pmax(jax.lax.stop_gradient(seg_max), psum_axis)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.where(mask, jnp.exp(scores - seg_max[segment_ids]), 0.0)
    denom = segment_sum(exp, segment_ids, num_segments)
    denom = jax.lax.psum(denom, psum_axis)
    return exp / jnp.maximum(denom, 1e-12)[segment_ids]

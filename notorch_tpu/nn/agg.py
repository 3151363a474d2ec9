"""Per-graph readout (pooling) over the batched graph.

Capability parity: reference ``notorch/nn/gnn/agg.py:15-86`` (Sum/Mean/Max/
Gated/SDPAttention over ``batch_node_index``). Segment ids of padding nodes
point at the trailing trash slot, which is sliced off, so no masking is
needed; ``Mean``'s denominators come out right for the same reason.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph
from notorch_tpu.nn.ops import segment_max, segment_mean, segment_softmax, segment_sum


def _num_segments(G: BatchedGraph) -> int:
    return G.n_graphs + 1  # + trash slot for padding


class Sum(nn.Module):
    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        return segment_sum(G.node_feats, G.node_graph, _num_segments(G))[: G.n_graphs]


class Mean(nn.Module):
    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        return segment_mean(G.node_feats, G.node_graph, _num_segments(G))[: G.n_graphs]


class Max(nn.Module):
    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        return segment_max(G.node_feats, G.node_graph, _num_segments(G))[: G.n_graphs]


class Gated(nn.Module):
    """Learned softmax-attention pooling (reference agg.py:50-63)."""

    input_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False, **kwargs) -> jnp.ndarray:
        scores = nn.Dense(1, dtype=self.dtype, name="a")(G.node_feats).squeeze(-1)
        alpha = segment_softmax(scores, G.node_graph, _num_segments(G), mask=G.node_mask)
        weighted = alpha[:, None] * G.node_feats
        return segment_sum(weighted, G.node_graph, _num_segments(G))[: G.n_graphs]


class SDPAttention(nn.Module):
    """Query-conditioned scaled-dot-product pooling (reference agg.py:66-86)."""

    key_dim: int = DEFAULT_HIDDEN_DIM

    @nn.compact
    def __call__(
        self, G: BatchedGraph, Q: jnp.ndarray, training: bool = False, **kwargs
    ) -> jnp.ndarray:
        # Q: [b, d] per-graph queries; trash slot gets a zero query
        q_full = jnp.concatenate([Q, jnp.zeros_like(Q[:1])], axis=0)
        scores = (q_full[G.node_graph] * G.node_feats).sum(-1) / jnp.sqrt(float(self.key_dim))
        alpha = segment_softmax(scores, G.node_graph, _num_segments(G), mask=G.node_mask)
        weighted = alpha[:, None] * G.node_feats
        return segment_sum(weighted, G.node_graph, _num_segments(G))[: G.n_graphs]

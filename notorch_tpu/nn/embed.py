"""Graph type-index embedding.

The reference uses ``nn.EmbeddingBag(mode="sum")`` over multi-family type
indices (reference ``notorch/nn/gnn/embed.py:11-36``). The XLA form is an
embedding take followed by a sum over the family axis — which XLA fuses into
a single gather+reduce.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph
from notorch_tpu.transforms.vocab import DEFAULT_NUM_ATOM_TYPES, DEFAULT_NUM_BOND_TYPES


class EmbeddingBagSum(nn.Module):
    """``EmbeddingBag(mode="sum")`` equivalent: take + sum over the last axis
    of the index tensor."""

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, type_ids: jnp.ndarray) -> jnp.ndarray:
        table = nn.Embed(self.num_embeddings, self.features, dtype=self.dtype, name="embedding")
        return table(type_ids).sum(axis=-2)


class GraphEmbedding(nn.Module):
    """Embed node and edge type indices into float hiddens."""

    num_node_types: int = DEFAULT_NUM_ATOM_TYPES
    num_edge_types: int = DEFAULT_NUM_BOND_TYPES
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False) -> BatchedGraph:
        node = EmbeddingBagSum(self.num_node_types, self.hidden_dim, self.dtype, name="node")
        edge = EmbeddingBagSum(self.num_edge_types, self.hidden_dim, self.dtype, name="edge")
        return G.update(node_feats=node(G.node_feats), edge_feats=edge(G.edge_feats))

    @classmethod
    def from_transform(cls, transform, **kwargs) -> "GraphEmbedding":
        return cls(transform.num_node_types, transform.num_edge_types, **kwargs)

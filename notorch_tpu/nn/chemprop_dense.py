"""D-MPNN over the dense per-molecule layout — the MXU hot path.

Same recurrence as :mod:`notorch_tpu.nn.chemprop` (reference
``notorch/nn/gnn/chemprop.py:28-88``), with every sparse op replaced by a
batched dense contraction (see ``notorch_tpu.data.dense``):

    scatter  -> einsum('bve,bed->bvd', S, m)        (MXU)
    gather   -> einsum('bev,bvd->bed', G, n)        (MXU)
    rev      -> pair-swap reshape                    (free)

The one-hot operators are built once per call in the layer's compute dtype;
XLA hoists them out of the depth loop.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.dense import DenseBatchedGraph, rev_pair_swap


class _Update(nn.Module):
    hidden_dim: int
    bias: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.hidden_dim, use_bias=self.bias, dtype=self.dtype, name="update")(x)


class DenseChempropBlock(nn.Module):
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    act: Callable = nn.relu
    bias: bool = True
    dropout: float = 0.0
    depth: int = 3
    residual: bool = True
    shared: bool = False
    reduce: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> DenseBatchedGraph:
        if self.reduce != "sum":
            raise NotImplementedError("dense layout implements reduce='sum'")
        S = G.scatter_matrix(self.dtype)  # [B, V, E]
        Gm = G.gather_matrix(self.dtype)  # [B, E, V]

        node_feats = G.node_feats.astype(self.dtype)
        edge_hiddens = (
            jnp.einsum("bev,bvd->bed", Gm, node_feats) + G.edge_feats.astype(self.dtype)
        )

        names = ["layer"] * self.depth if self.shared else [f"layer_{i}" for i in range(self.depth)]
        layers = {}
        for n in names:
            if n not in layers:
                # param path layer_i/update/kernel — identical to the flat
                # ChempropBlock so weights are layout-interchangeable
                layers[n] = _Update(self.hidden_dim, self.bias, self.dtype, name=n)
        drop = nn.Dropout(self.dropout, deterministic=not training)

        for n in names:
            m = self.act(edge_hiddens)  # [B, E, d]
            node_messages = jnp.einsum("bve,bed->bvd", S, m)
            edge_messages = jnp.einsum("bev,bvd->bed", Gm, node_messages) - rev_pair_swap(m)
            out = drop(layers[n](edge_messages))
            edge_hiddens = edge_hiddens + out if self.residual else out

        node_hiddens = jnp.einsum("bve,bed->bvd", S, edge_hiddens)
        return G.update(node_feats=node_hiddens, edge_feats=edge_hiddens)


class DenseGraphEmbedding(nn.Module):
    """Type-index embedding for the dense layout (same tables/semantics as
    :class:`notorch_tpu.nn.embed.GraphEmbedding`)."""

    num_node_types: int
    num_edge_types: int
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> DenseBatchedGraph:
        from notorch_tpu.nn.embed import EmbeddingBagSum

        # same module tree as the flat GraphEmbedding, so parameters are
        # interchangeable between layouts
        node = EmbeddingBagSum(self.num_node_types, self.hidden_dim, self.dtype, name="node")
        edge = EmbeddingBagSum(self.num_edge_types, self.hidden_dim, self.dtype, name="edge")
        return G.update(node_feats=node(G.node_feats), edge_feats=edge(G.edge_feats))


class DenseSum(nn.Module):
    """Per-graph masked sum readout over the node axis: [B, V, d] -> [B, d]."""

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        mask = G.node_mask[..., None].astype(G.node_feats.dtype)
        return (G.node_feats * mask).sum(axis=1)


class DenseMean(nn.Module):
    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        mask = G.node_mask[..., None].astype(G.node_feats.dtype)
        total = (G.node_feats * mask).sum(axis=1)
        counts = jnp.maximum(mask.sum(axis=1), 1.0)
        return total / counts


class DenseMax(nn.Module):
    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        neg = jnp.where(G.node_mask[..., None], G.node_feats, -jnp.inf)
        out = neg.max(axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)

"""Graph attention layers over the batched sparse graph.

Capability parity: reference ``notorch/nn/gnn/attention.py`` — treated as a
*spec*, since the reference file has NameError-level bugs (missing
``super().__init__``, undefined ``W_e``/``W_k`` — SURVEY §2.4). Semantics
implemented:

- :class:`GATv2Layer` (arXiv:2105.14491): per-edge score
  ``a . LeakyReLU(W_s h_src + W_d h_dst + W_e e)`` with segment-softmax
  normalization over each destination node's incoming edges;
- :class:`GraphSelfAttention`: multi-head dot-product attention restricted to
  graph edges, with an additive per-edge bias, segment-softmax per
  destination.

Both use the padding-safe masked ``segment_softmax``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph
from notorch_tpu.nn.ops import segment_softmax, segment_sum


class GATv2Layer(nn.Module):
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    num_heads: int = 4
    negative_slope: float = 0.2
    use_edge_feats: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False) -> BatchedGraph:
        d, H = self.hidden_dim, self.num_heads
        dh = d // H
        assert dh * H == d, "hidden_dim must divide num_heads"

        h_src = nn.Dense(d, dtype=self.dtype, name="W_src")(G.node_feats)
        h_dst = nn.Dense(d, dtype=self.dtype, name="W_dst")(G.node_feats)
        z = h_src[G.src] + h_dst[G.dst]
        if self.use_edge_feats and G.edge_feats.ndim == 2:
            z = z + nn.Dense(d, dtype=self.dtype, name="W_e")(G.edge_feats)

        z = z.reshape(-1, H, dh)
        z = nn.leaky_relu(z, self.negative_slope)
        scores = nn.DenseGeneral(1, axis=-1, dtype=self.dtype, name="a")(z).squeeze(-1)  # [E, H]

        alpha = segment_softmax(scores, G.dst, G.num_nodes, mask=G.edge_mask)  # [E, H]
        values = h_src[G.src].reshape(-1, H, dh)
        out = segment_sum(alpha[..., None] * values, G.dst, G.num_nodes)  # [V, H, dh]
        return G.update(node_feats=out.reshape(-1, d))


class GATBlock(nn.Module):
    """Depth-stacked GATv2 encoder: per-layer attention + residual + a
    position-wise feed-forward (the standard pre-activation graph-attention
    stack). ``attention="sdp"`` swaps the score function for the
    edge-biased dot-product form (:class:`GraphSelfAttention`) — a graph
    transformer layer. This is the recipe surface behind
    ``model.kind: gat`` (``notorch_tpu.models.gat``); the reference's
    attention file is NameError-broken
    (``notorch/nn/gnn/attention.py:8,42``), so the stack composition
    follows the GATv2/Graphormer literature rather than reference code."""

    hidden_dim: int = DEFAULT_HIDDEN_DIM
    depth: int = 3
    num_heads: int = 4
    attention: str = "gatv2"  # "gatv2" | "sdp"
    dropout: float = 0.0
    ffn_mult: int = 2
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False) -> BatchedGraph:
        if self.attention not in ("gatv2", "sdp"):
            raise ValueError(f"unknown attention {self.attention!r}")
        layer_cls = GATv2Layer if self.attention == "gatv2" else GraphSelfAttention
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")(G.node_feats)
        drop = nn.Dropout(self.dropout, deterministic=not training)
        for i in range(self.depth):
            attn = layer_cls(
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name=f"attn_{i}",
            )
            out = attn(G.update(node_feats=h), training).node_feats
            h = h + drop(out) if self.residual else drop(out)
            ff = nn.Dense(
                self.ffn_mult * self.hidden_dim, dtype=self.dtype, name=f"ffn_{i}_0"
            )(h)
            ff = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"ffn_{i}_1")(
                nn.relu(ff)
            )
            h = h + drop(ff) if self.residual else drop(ff)
        return G.update(node_feats=h)


class GraphSelfAttention(nn.Module):
    """Edge-restricted multi-head self-attention with additive edge bias."""

    hidden_dim: int = DEFAULT_HIDDEN_DIM
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False) -> BatchedGraph:
        d, H = self.hidden_dim, self.num_heads
        dh = d // H
        assert dh * H == d

        q = nn.Dense(d, dtype=self.dtype, name="W_q")(G.node_feats).reshape(-1, H, dh)
        k = nn.Dense(d, dtype=self.dtype, name="W_k")(G.node_feats).reshape(-1, H, dh)
        v = nn.Dense(d, dtype=self.dtype, name="W_v")(G.node_feats).reshape(-1, H, dh)

        scores = (q[G.dst] * k[G.src]).sum(-1) / jnp.sqrt(float(dh))  # [E, H]
        if G.edge_feats.ndim == 2:
            scores = scores + nn.Dense(H, dtype=self.dtype, name="W_bias")(G.edge_feats)

        alpha = segment_softmax(scores, G.dst, G.num_nodes, mask=G.edge_mask)
        out = segment_sum(alpha[..., None] * v[G.src], G.dst, G.num_nodes)
        out = nn.Dense(d, dtype=self.dtype, name="W_o")(out.reshape(-1, d))
        return G.update(node_feats=out)

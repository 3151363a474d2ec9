"""D-MPNN (bond-message / "chemprop") message passing — the flagship model.

Recurrence per layer (semantics of reference ``notorch/nn/gnn/chemprop.py:28-43``):

    h         = act(edge_hiddens)
    m_v       = segment_reduce(h, dst)              # E -> V
    m_e       = m_v[src] - h[rev]                   # subtract reverse message
    edge_hid' = Dropout(Linear(m_e))                # (+ residual)

Block (``chemprop.py:81-88``): init edge hiddens = node_feats[src] + edge_feats,
run ``depth`` layers (optionally weight-shared / residual), then a final
E -> V reduction into node hiddens.

TPU notes: the E-sized gathers and segment reduction are the hot ops; the
default path uses XLA ``segment_sum`` (one compiled fusion per bucket shape),
and ``notorch_tpu.kernels.mpnn`` provides a fused Pallas kernel for the
gather-reduce-gather chain. All shapes static; padding edges feed only the
padding sink node (see ``notorch_tpu.data.graph``).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph
from notorch_tpu.nn.ops import segment_reduce


class ChempropLayer(nn.Module):
    """One D-MPNN layer.

    ``psum_axis``: when the batched graph's *edges* are sharded over a mesh
    axis (nodes replicated — edge partitioning, the graph analog of context
    parallelism), set this to that axis name: the local E->V reduction is
    combined across shards with an ICI ``psum`` before the V->E gather, which
    is exactly the boundary/halo exchange of the partitioned message passing.
    """

    hidden_dim: int = DEFAULT_HIDDEN_DIM
    act: Callable = nn.relu
    bias: bool = True
    dropout: float = 0.0
    reduce: str = "sum"
    dtype: Any = jnp.float32
    psum_axis: str | None = None
    # "gather" (dense in_edges take-sum) | "segment" (XLA segment ops) |
    # "csr" (tile-packed Pallas SpMM; needs with_csr_packing / DataLoader
    # csr_pack=True, falls back to segment without the metadata)
    impl: str = "gather"

    @nn.compact
    def __call__(
        self,
        edge_hiddens: jnp.ndarray,  # [E, d]
        G: BatchedGraph,
        training: bool = False,
    ) -> jnp.ndarray:
        messages = self.act(edge_hiddens)
        node_messages = _reduce_and_combine(
            messages, G, self.reduce, self.impl, self.psum_axis
        )
        edge_messages = node_messages[G.src] - messages[G.rev]
        out = nn.Dense(self.hidden_dim, use_bias=self.bias, dtype=self.dtype, name="update")(
            edge_messages
        )
        return nn.Dropout(self.dropout, deterministic=not training)(out)


class ChempropBlock(nn.Module):
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    act: Callable = nn.relu
    bias: bool = True
    dropout: float = 0.0
    depth: int = 3
    residual: bool = True
    shared: bool = False
    reduce: str = "sum"
    dtype: Any = jnp.float32
    psum_axis: str | None = None
    impl: str = "gather"
    # rematerialize each layer on the backward pass (jax.checkpoint): trades
    # one extra forward of FLOPs for not keeping E-sized activations of every
    # layer live in HBM — the lever for very large batched graphs
    remat: bool = False

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False) -> BatchedGraph:
        edge_hiddens = G.node_feats[G.src] + G.edge_feats

        # static_argnums counts self as 0: arg 3 is the ``training`` flag
        layer_cls = nn.remat(ChempropLayer, static_argnums=(3,)) if self.remat else ChempropLayer
        kw = dict(
            act=self.act,
            bias=self.bias,
            dropout=self.dropout,
            reduce=self.reduce,
            dtype=self.dtype,
            psum_axis=self.psum_axis,
            impl=self.impl,
        )
        if self.shared:
            layers = [layer_cls(self.hidden_dim, name="layer", **kw)] * self.depth
        else:
            layers = [
                layer_cls(self.hidden_dim, name=f"layer_{i}", **kw)
                for i in range(self.depth)
            ]

        for layer in layers:
            out = layer(edge_hiddens, G, training)
            edge_hiddens = edge_hiddens + out if self.residual else out

        node_hiddens = _reduce_and_combine(
            edge_hiddens, G, self.reduce, self.impl, self.psum_axis
        )
        return G.update(node_feats=node_hiddens, edge_feats=edge_hiddens)


def _node_reduce(messages, G: BatchedGraph, reduce: str, impl: str):
    """E -> V reduction: tile-packed Pallas SpMM (``csr``), dense
    fixed-degree gather (scatter-free), or XLA segment ops."""
    if impl == "csr" and reduce == "sum" and G.csr_perm is not None:
        from notorch_tpu.kernels.csr_segment import csr_segment_sum_packed

        interpret = jax.default_backend() != "tpu"
        return csr_segment_sum_packed(
            messages, G.csr_perm, G.csr_dst, num_nodes=G.num_nodes,
            dst=G.dst, edge_mask=G.edge_mask, interpret=interpret,
        )
    if impl == "gather" and G.in_edges is not None and reduce in ("sum", "mean", "max"):
        ext = jnp.concatenate([messages, jnp.zeros_like(messages[:1])], axis=0)
        gathered = ext[G.in_edges]  # [V, K, d]
        if reduce == "sum":
            return gathered.sum(axis=1)
        valid = (G.in_edges < messages.shape[0])[..., None]
        if reduce == "mean":
            return gathered.sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1)
        # match segment_max semantics (nn/ops.py): empty segments -> 0,
        # negative maxima preserved (a clip(min=0) here would diverge from
        # impl="segment" on the block's FINAL reduce, whose input is the
        # un-activated edge_hiddens)
        out = jnp.where(valid, gathered, -jnp.inf).max(axis=1)
        return jnp.where(jnp.isneginf(out), 0.0, out)
    return segment_reduce(messages, G.dst, G.num_nodes, reduce)


def _cross_shard_combine(node_values, reduce: str, axis: str | None):
    if axis is None:
        return node_values
    if reduce == "sum":
        return jax.lax.psum(node_values, axis)
    if reduce == "max":
        return jax.lax.pmax(node_values, axis)
    raise NotImplementedError(
        f"edge-partitioned reduce={reduce!r} (mean goes through "
        "_reduce_and_combine: psum-sum / psum-count)"
    )


def _reduce_and_combine(values, G: BatchedGraph, reduce: str, impl: str, axis):
    """E->V reduce + cross-shard combine. Sharded mean cannot combine
    per-shard means (each shard sees a partial in-edge set), so it psums
    the local SUMS and the local real-edge COUNTS separately and divides
    once — exact vs the unsharded mean (floor-1 denominator matches
    ``segment_mean``). Reference semantics: ``notorch/nn/gnn/chemprop.py:25``
    (torch_scatter reduce= on a single device)."""
    if axis is not None and reduce == "mean":
        sums = jax.lax.psum(_node_reduce(values, G, "sum", impl), axis)
        ones = jnp.ones((values.shape[0], 1), values.dtype)
        counts = jax.lax.psum(
            segment_reduce(ones, G.dst, G.num_nodes, "sum"), axis
        )
        return sums / jnp.maximum(counts, 1.0)
    return _cross_shard_combine(_node_reduce(values, G, reduce, impl), reduce, axis)

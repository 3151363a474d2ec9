"""Dense per-molecule graph layout — the MXU-native message-passing format.

Motivation (measured on TPU v5e): the flat padded layout runs D-MPNN at ~3%
of MXU peak because the E->V scatter and V->E gathers serialize. Molecules
are tiny (<=~64 atoms), so the TPU-native layout is **one dense block per
molecule**: arrays shaped ``[B, E_m, ...]`` / ``[B, V_m, ...]`` with
molecule-local indices. Then:

- the E->V segment reduction becomes ``einsum('bve,bed->bvd', scatter_1hot,
  messages)`` — a batched matmul on the MXU;
- the V->E source gather becomes ``einsum('bev,bvd->bed', gather_1hot, ...)``
  — another batched matmul;
- the reverse-edge gather is FREE: edges stay (u,v),(v,u) interleaved, so
  ``rev`` is a pair swap = ``reshape(B, E_m//2, 2, d)[:, :, ::-1]``;
- per-graph readout is a masked sum over the node axis.

Everything lands on the MXU; there is no scatter or dynamic gather anywhere
in the hot loop. Padding cost: molecules pad to the batch max (ladder-
rounded), ~25-50% — far cheaper than the 30x utilization gap it closes.
"""

from __future__ import annotations

from collections.abc import Iterable

import jax.numpy as jnp
import numpy as np
from flax import struct

from notorch_tpu.data.graph import Graph

__all__ = ["DenseBatchedGraph", "pad_graphs_dense"]


class DenseBatchedGraph(struct.PyTreeNode):
    """A batch of molecules as dense per-molecule blocks.

    ``node_feats``: [B, V_m, t_v] ints (type ids) or [B, V_m, d] floats.
    ``src``/``dst``: [B, E_m] molecule-local indices; padding edges point at
    node ``V_m - 1`` (a padding slot — real molecules never use it because
    collation reserves it).
    """

    node_feats: jnp.ndarray
    edge_feats: jnp.ndarray
    src: jnp.ndarray  # [B, E_m] i32
    dst: jnp.ndarray  # [B, E_m] i32
    node_mask: jnp.ndarray  # [B, V_m] bool
    edge_mask: jnp.ndarray  # [B, E_m] bool
    graph_mask: jnp.ndarray  # [B] bool — False for batch-padding slots

    @property
    def n_graphs(self) -> int:
        return self.node_feats.shape[0]

    @property
    def nodes_per_graph(self) -> int:
        return self.node_feats.shape[1]

    @property
    def edges_per_graph(self) -> int:
        return self.src.shape[1]

    def __len__(self) -> int:
        return self.n_graphs

    def update(self, **kwargs) -> "DenseBatchedGraph":
        return self.replace(**kwargs)

    # one-hot operators, built on device (cheap; XLA folds them into the
    # batched matmuls)
    def scatter_matrix(self, dtype=jnp.float32) -> jnp.ndarray:
        """[B, V_m, E_m] with S[b, v, e] = 1 iff dst[b, e] == v and edge is
        real. ``S @ messages`` = per-node incoming sum."""
        v_ids = jnp.arange(self.nodes_per_graph)[None, :, None]
        S = (self.dst[:, None, :] == v_ids) & self.edge_mask[:, None, :]
        return S.astype(dtype)

    def gather_matrix(self, dtype=jnp.float32) -> jnp.ndarray:
        """[B, E_m, V_m] with G[b, e, v] = 1 iff src[b, e] == v."""
        v_ids = jnp.arange(self.nodes_per_graph)[None, None, :]
        G = self.src[:, :, None] == v_ids
        return G.astype(dtype)


def rev_pair_swap(edge_values: jnp.ndarray) -> jnp.ndarray:
    """messages[rev] for the interleaved pair layout: a pure reshape."""
    B, E = edge_values.shape[:2]
    rest = edge_values.shape[2:]
    paired = edge_values.reshape(B, E // 2, 2, *rest)
    return paired[:, :, ::-1].reshape(B, E, *rest)


def pad_graphs_dense(
    graphs: Iterable[Graph],
    nodes_per_graph: int,
    edges_per_graph: int,
    graph_cap: int | None = None,
    np_out: bool = False,
) -> DenseBatchedGraph:
    """Pad each molecule into its own [V_m, E_m] block.

    ``nodes_per_graph`` must exceed the largest molecule by 1 (the padding
    sink slot); ``edges_per_graph`` must be even (pair layout).
    """
    graphs = list(graphs)
    B = graph_cap if graph_cap is not None else len(graphs)
    if len(graphs) > B:
        raise ValueError(f"{len(graphs)} graphs exceed graph_cap={B}")
    if edges_per_graph % 2 != 0:
        raise ValueError("edges_per_graph must be even (interleaved pair layout)")
    V_m, E_m = nodes_per_graph, edges_per_graph

    t_v = graphs[0].node_types.shape[1] if graphs else 1
    t_e = graphs[0].edge_types.shape[1] if graphs else 1

    node_types = np.zeros((B, V_m, t_v), dtype=np.int32)
    edge_types = np.zeros((B, E_m, t_e), dtype=np.int32)
    src = np.full((B, E_m), V_m - 1, dtype=np.int32)
    dst = np.full((B, E_m), V_m - 1, dtype=np.int32)
    node_mask = np.zeros((B, V_m), dtype=bool)
    edge_mask = np.zeros((B, E_m), dtype=bool)
    graph_mask = np.zeros(B, dtype=bool)

    for i, g in enumerate(graphs):
        V, E = g.num_nodes, g.num_edges
        if V + 1 > V_m:
            raise ValueError(f"molecule {i} has {V} nodes; nodes_per_graph={V_m} (1 reserved)")
        if E > E_m:
            raise ValueError(f"molecule {i} has {E} edges; edges_per_graph={E_m}")
        node_types[i, :V] = g.node_types
        edge_types[i, :E] = g.edge_types
        src[i, :E] = g.src
        dst[i, :E] = g.dst
        node_mask[i, :V] = True
        edge_mask[i, :E] = True
        graph_mask[i] = True

    conv = (lambda x: x) if np_out else jnp.asarray
    return DenseBatchedGraph(
        node_feats=conv(node_types),
        edge_feats=conv(edge_types),
        src=conv(src),
        dst=conv(dst),
        node_mask=conv(node_mask),
        edge_mask=conv(edge_mask),
        graph_mask=conv(graph_mask),
    )

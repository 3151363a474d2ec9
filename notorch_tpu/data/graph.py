"""Graph data model: ragged host graphs and padded, static-shape device batches.

TPU-first design: the reference's ``Graph``/``BatchedGraph``
(``notorch/data/models/graph.py:14,167``) are dynamic-shape COO tensors batched
by offset-concatenation. Here the host side stays ragged numpy, but the device
side is a **padded pytree with static shapes** so every bucket compiles once
under ``jit``/``pjit``:

- padding nodes occupy trailing node slots; padding edges point at the last
  (padding) node slot and at themselves via ``rev``, so garbage stays confined
  to padding slots without per-op masking;
- segment ids of padding elements point at one extra "trash" graph slot
  (``n_graphs``), so segment reductions need no masking either;
- ``node_mask``/``edge_mask`` are carried for ops that do need true counts
  (mean aggregation, metrics).

Note: the reference's ``BatchedGraph.from_graphs`` offsets ``rev_index`` by the
*node* offset (``graph.py:199``) — a latent bug. Here ``rev`` is offset by the
edge offset, which is what the D-MPNN recurrence requires.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = ["Graph", "BatchedGraph", "pad_graphs", "bucket_caps"]


@dataclass
class Graph:
    """A single (host-side, ragged) graph of integer type-index features.

    ``rev[e]`` is the index of the reverse directed edge of ``e`` — the
    D-MPNN essential. With interleaved (u,v),(v,u) edge construction this is
    the pairwise swap permutation [1,0,3,2,...].
    """

    node_types: np.ndarray  # [V, t_v] int32
    edge_types: np.ndarray  # [E, t_e] int32
    src: np.ndarray  # [E] int32
    dst: np.ndarray  # [E] int32
    rev: np.ndarray  # [E] int32

    @property
    def num_nodes(self) -> int:
        return len(self.node_types)

    @property
    def num_edges(self) -> int:
        return len(self.edge_types)

    def __repr__(self) -> str:
        """Compact shape summary (reference ``Graph.__repr__``,
        graph.py:149-164) instead of the dataclass array dump."""
        return (
            f"Graph(V={self.num_nodes}, E={self.num_edges}, "
            f"node_types=[{self.num_nodes}, {self.node_types.shape[1]}], "
            f"edge_types=[{self.num_edges}, {self.edge_types.shape[1]}])"
        )

    @property
    def edge_index(self) -> np.ndarray:
        """COO ``[2, E]`` view, reference-compatible."""
        return np.stack([self.src, self.dst])

    def dense_adjacency(self) -> np.ndarray:
        """Dense ``[V, V]`` adjacency (reference ``Graph.A``, graph.py:56-63)."""
        A = np.zeros((self.num_nodes, self.num_nodes), dtype=np.int32)
        A[self.src, self.dst] = 1
        return A

    def transition_matrix(self) -> np.ndarray:
        """Row-normalized Markov transition matrix (reference ``Graph.P``)."""
        A = self.dense_adjacency().astype(np.float64)
        deg = A.sum(1, keepdims=True)
        return A / np.where(deg == 0, 1.0, deg)

    def dense2sparse(self) -> np.ndarray:
        """``[V, V]`` map from (u, v) to the directed edge id, -1 if absent
        (reference ``Graph.dense2sparse``, graph.py:75-94)."""
        index = -np.ones((self.num_nodes, self.num_nodes), dtype=np.int64)
        index[self.src, self.dst] = np.arange(self.num_edges)
        return index

    def random_walk(
        self,
        length: int,
        num_walks: int = 1,
        starting_nodes: np.ndarray | None = None,
        return_edge_ids: bool = True,
        rng: np.random.Generator | None = None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """Sample random walks over the transition matrix.

        Capability parity: reference ``Graph.random_walk`` (graph.py:96-147).
        Returns node ids ``[n, w, length+1]`` and optionally the traversed
        edge ids ``[n, w, length]``.
        """
        rng = rng or np.random.default_rng()
        if starting_nodes is None:
            starting_nodes = np.arange(self.num_nodes)
        P = self.transition_matrix()
        walks = [np.repeat(starting_nodes[:, None], num_walks, axis=1)]
        for _ in range(length):
            curr = walks[-1]
            probs = P[curr]  # [n, w, V]
            flat = probs.reshape(-1, self.num_nodes)
            cum = flat.cumsum(-1)
            u = rng.random((len(flat), 1)) * cum[:, -1:]
            nxt = (u > cum).sum(-1).reshape(curr.shape)
            walks.append(nxt)
        node_ids = np.stack(walks, axis=-1)
        if return_edge_ids:
            edge_ids = self.dense2sparse()[node_ids[..., :-1], node_ids[..., 1:]]
        else:
            edge_ids = None
        return node_ids, edge_ids


class BatchedGraph(struct.PyTreeNode):
    """A padded batch of graphs as a static-shape JAX pytree.

    ``node_feats``/``edge_feats`` start as integer type indices and are
    replaced by float hiddens as the model runs (functional ``replace``
    updates, mirroring the reference's ``UpdateMixin`` semantics).
    """

    node_feats: jnp.ndarray  # [V_cap, t_v] i32 or [V_cap, d] float
    edge_feats: jnp.ndarray  # [E_cap, t_e] i32 or [E_cap, d] float
    src: jnp.ndarray  # [E_cap] i32
    dst: jnp.ndarray  # [E_cap] i32
    rev: jnp.ndarray  # [E_cap] i32
    node_graph: jnp.ndarray  # [V_cap] i32, padding -> n_graphs (trash slot)
    edge_graph: jnp.ndarray  # [E_cap] i32, padding -> n_graphs
    node_mask: jnp.ndarray  # [V_cap] bool
    edge_mask: jnp.ndarray  # [E_cap] bool
    num_graphs_real: jnp.ndarray  # [] i32
    in_edges: jnp.ndarray | None = None  # [V_cap, K] incoming edge ids, pad=E_cap
    # tile-packed CSR metadata (with_csr_packing): slot -> edge id / dst,
    # fixed edge budget per 128-node tile, -1 in padding slots
    csr_perm: jnp.ndarray | None = None  # [n_tiles * budget] i32
    csr_dst: jnp.ndarray | None = None  # [n_tiles * budget] i32
    n_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def num_nodes(self) -> int:
        return self.node_feats.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_feats.shape[0]

    def __len__(self) -> int:
        """Number of graph slots (static)."""
        return self.n_graphs

    def update(self, **kwargs) -> "BatchedGraph":
        return self.replace(**kwargs)

    def __repr__(self) -> str:
        """Compact static-shape summary; never touches array *values* so it
        is safe on tracers and never forces a device sync."""
        feat = getattr(self.node_feats, "dtype", "?")
        extras = [
            name
            for name in ("in_edges", "csr_perm", "csr_dst")
            if getattr(self, name) is not None
        ]
        tail = f", extras={extras}" if extras else ""
        return (
            f"BatchedGraph(V_cap={self.num_nodes}, E_cap={self.num_edges}, "
            f"graph_slots={self.n_graphs}, feats={feat}{tail})"
        )


def build_in_edges(
    dst: np.ndarray, edge_mask: np.ndarray, node_cap: int, min_k: int = 8
) -> np.ndarray:
    """Fixed-degree incoming-edge table: ``out[v, k]`` = id of the k-th edge
    with ``dst == v``, padded with ``E_cap`` (a sentinel row of zeros in the
    extended message array).

    This turns the E->V segment reduction into a dense take-and-sum — no
    scatter at all — which is the TPU-friendly layout: molecular graphs have
    max degree <= ~6, so K is a small static constant.
    """
    E = len(dst)
    real = np.nonzero(np.asarray(edge_mask))[0]
    d = np.asarray(dst)[real]
    order = np.argsort(d, kind="stable")
    d_sorted = d[order]
    e_sorted = real[order].astype(np.int32)
    starts = np.searchsorted(d_sorted, np.arange(node_cap))
    pos = np.arange(len(d_sorted)) - starts[d_sorted]
    K = max(min_k, int(pos.max()) + 1 if len(pos) else 1)
    out = np.full((node_cap, K), E, dtype=np.int32)
    out[d_sorted, pos] = e_sorted
    return out


def sort_edges_by_dst(bg: BatchedGraph) -> tuple[BatchedGraph, np.ndarray]:
    """Permute a (host, numpy) padded batch into dst-sorted (padded-CSR)
    edge order and attach row pointers via :func:`csr_row_ptr`.

    Returns ``(sorted_graph, perm)`` where ``perm`` maps new -> old edge ids.
    ``rev`` is rebased through the permutation (it stays an involution but is
    no longer the pairwise interleave). Padding edges target the sink node
    (last slot) so they sort to the tail.
    """
    dst = np.asarray(bg.dst)
    perm = np.argsort(dst, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    new_rev = inv[np.asarray(bg.rev)[perm]]
    sorted_bg = bg.replace(
        edge_feats=np.asarray(bg.edge_feats)[perm],
        src=np.asarray(bg.src)[perm],
        dst=dst[perm],
        rev=new_rev,
        edge_graph=np.asarray(bg.edge_graph)[perm],
        edge_mask=np.asarray(bg.edge_mask)[perm],
        in_edges=build_in_edges(
            dst[perm], np.asarray(bg.edge_mask)[perm], bg.num_nodes,
            min_k=bg.in_edges.shape[1] if bg.in_edges is not None else 8,
        ),
    )
    return sorted_bg, perm


def with_csr_packing(
    bg: BatchedGraph, tile_v: int = 128, budget: int | None = None
) -> BatchedGraph:
    """Attach tile-packed CSR metadata (host-side, once per batch topology)
    for the Pallas ``csr_segment_sum_packed`` reduce (``impl="csr"``).

    Each ``tile_v``-node tile gets a fixed budget of edge slots; only REAL
    (unmasked) edges are packed — padding edges feed the sink node, whose row
    is masked downstream anyway, so skipping them keeps the budget tight.
    ``num_nodes`` must be a multiple of ``tile_v`` (128-aligned node caps).
    """
    from notorch_tpu.kernels.csr_segment import pack_edges_by_tile

    if bg.num_nodes % tile_v != 0:
        raise ValueError(
            f"node cap {bg.num_nodes} must be a multiple of tile_v={tile_v} "
            "for CSR packing (use 128-aligned node caps)"
        )
    dst = np.asarray(bg.dst)
    mask = np.asarray(bg.edge_mask)
    real_ids = np.nonzero(mask)[0].astype(np.int32)
    perm_r, packed_dst, _ = pack_edges_by_tile(
        dst[real_ids], num_nodes=bg.num_nodes, tile_v=tile_v, budget=budget
    )
    # re-express slot -> edge-id through the real-edge subset
    perm = np.where(perm_r >= 0, real_ids[np.clip(perm_r, 0, None)], -1).astype(np.int32)
    return bg.replace(csr_perm=perm, csr_dst=packed_dst)


def csr_row_ptr(sorted_dst: np.ndarray, num_nodes: int) -> np.ndarray:
    """Row pointers for dst-sorted edges: edges of node v live in
    ``[ptr[v], ptr[v+1])``."""
    return np.searchsorted(
        np.asarray(sorted_dst), np.arange(num_nodes + 1), side="left"
    ).astype(np.int32)


def bucket_caps(
    num_nodes: int, num_edges: int, node_buckets: Sequence[int], edge_buckets: Sequence[int]
) -> tuple[int, int]:
    """Pick the smallest bucket caps that fit (num_nodes+1, num_edges) — one
    node slot is always reserved for the padding sink."""
    v_cap = next((b for b in node_buckets if b >= num_nodes + 1), None)
    e_cap = next((b for b in edge_buckets if b >= num_edges), None)
    if v_cap is None:
        v_cap = int(2 ** np.ceil(np.log2(max(num_nodes + 1, 2))))
    if e_cap is None:
        e_cap = int(2 ** np.ceil(np.log2(max(num_edges, 2))))
    return v_cap, e_cap


def pad_graphs(
    graphs: Iterable[Graph],
    node_cap: int,
    edge_cap: int,
    graph_cap: int | None = None,
    np_out: bool = False,
) -> BatchedGraph:
    """Disjoint-union batch + pad to static caps.

    The last node slot (``node_cap - 1``) is the padding sink: padded edges
    have ``src = dst = node_cap - 1`` and ``rev`` pointing at themselves.
    """
    graphs = list(graphs)
    n_graphs = len(graphs)
    graph_cap = graph_cap if graph_cap is not None else n_graphs
    if n_graphs > graph_cap:
        raise ValueError(f"{n_graphs} graphs exceed graph_cap={graph_cap}")

    total_v = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    if total_v + 1 > node_cap:
        raise ValueError(f"{total_v} nodes exceed node_cap={node_cap} (one pad slot reserved)")
    if total_e > edge_cap:
        raise ValueError(f"{total_e} edges exceed edge_cap={edge_cap}")

    t_v = graphs[0].node_types.shape[1] if graphs else 1
    t_e = graphs[0].edge_types.shape[1] if graphs else 1

    node_types = np.zeros((node_cap, t_v), dtype=np.int32)
    edge_types = np.zeros((edge_cap, t_e), dtype=np.int32)
    src = np.full(edge_cap, node_cap - 1, dtype=np.int32)
    dst = np.full(edge_cap, node_cap - 1, dtype=np.int32)
    rev = np.arange(edge_cap, dtype=np.int32)
    node_graph = np.full(node_cap, graph_cap, dtype=np.int32)
    edge_graph = np.full(edge_cap, graph_cap, dtype=np.int32)
    node_mask = np.zeros(node_cap, dtype=bool)
    edge_mask = np.zeros(edge_cap, dtype=bool)

    v_off = e_off = 0
    for i, g in enumerate(graphs):
        V, E = g.num_nodes, g.num_edges
        node_types[v_off : v_off + V] = g.node_types
        edge_types[e_off : e_off + E] = g.edge_types
        src[e_off : e_off + E] = g.src + v_off
        dst[e_off : e_off + E] = g.dst + v_off
        rev[e_off : e_off + E] = g.rev + e_off
        node_graph[v_off : v_off + V] = i
        edge_graph[e_off : e_off + E] = i
        node_mask[v_off : v_off + V] = True
        edge_mask[e_off : e_off + E] = True
        v_off += V
        e_off += E

    conv = (lambda x: x) if np_out else jnp.asarray
    return BatchedGraph(
        node_feats=conv(node_types),
        edge_feats=conv(edge_types),
        src=conv(src),
        dst=conv(dst),
        rev=conv(rev),
        node_graph=conv(node_graph),
        edge_graph=conv(edge_graph),
        node_mask=conv(node_mask),
        edge_mask=conv(edge_mask),
        num_graphs_real=conv(np.asarray(n_graphs, dtype=np.int32)),
        in_edges=conv(build_in_edges(dst, edge_mask, node_cap)),
        n_graphs=graph_cap,
    )

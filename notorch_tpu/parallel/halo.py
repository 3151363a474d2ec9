"""Boundary-exchange edge partitioning for GIANT graphs.

The north-star design (BASELINE.json): when a single graph is too big for
one chip, shard its *nodes* in contiguous blocks and its *edges* (kept in
reverse pairs) across chips, and exchange only **boundary** node rows over
ICI — not the full node state. Molecule batches never need this (a disjoint
union partitions with an empty boundary — see
:func:`notorch_tpu.parallel.partition.build_molecule_spmd_batch`); this
module is the giant-single-graph path.

Per D-MPNN layer there are exactly two ``all_to_all`` exchanges of
``[n_shards, B, d]`` boundary rows (B = max boundary per shard pair):

1. **scatter**: each shard's partial E->V sums for *non-owned* boundary
   nodes go to their owners, who accumulate them — after which owners hold
   the complete node messages for their block;
2. **gather**: owners send back the (linearly transformed) node messages
   that other shards' edges read through ``src``.

Communication volume is ``2 * n * B * d`` per layer instead of the
replicated scheme's full ``V * d`` psum — for a well-partitioned graph
``B << V/n``.

**Overlap**: the layer is algebraically restructured via
``reduce(m) @ W == reduce(m @ W)`` so the E-sized update matmul ``m @ W``
(needed for the reverse-message term) has NO data dependence on exchange 1;
XLA's latency-hiding scheduler runs the DMA of the boundary scatter
concurrently with that MXU work. Exchange 2 then only waits on the small
``[V_loc, d] @ [d, d]`` owner-side transform.

Gradients are exact: every op is jnp/lax (``all_to_all`` transposes to
``all_to_all``, scatter-add to gather), verified against the unsharded
recurrence at 2/4/8 shards in ``tests/test_halo.py``.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph
from notorch_tpu.nn.ops import segment_sum

__all__ = [
    "HaloShard",
    "partition_edges_halo",
    "halo_reduce",
    "halo_gather",
    "halo_mpnn_block",
    "HaloChempropBlock",
    "comm_bytes_per_step",
]


class HaloShard(struct.PyTreeNode):
    """One shard of a halo-partitioned batched graph.

    Duck-types enough of :class:`BatchedGraph` (``node_feats``/``edge_feats``
    /``node_graph``/``node_mask``/``n_graphs``/``update``) that the embedding
    and the psum-aware readouts (:mod:`notorch_tpu.nn.agg`) consume it
    unchanged; the message passing goes through :func:`halo_mpnn_block`.

    Slot layouts (all local):

    - partial (reduce) buffer ``[v_loc + h_cap + 1]``: own block, halo-out
      slots, trash;
    - accumulate buffer ``[v_loc + 1]``: own block + trash;
    - gather buffer ``[v_loc + 1 + n * b_cap]``: own block, zero row, halo-in
      rows (owner-major, received via all_to_all).
    """

    node_feats: jnp.ndarray  # [v_loc, t] i32 types or [v_loc, d] float
    edge_feats: jnp.ndarray  # [e_loc, t] / [e_loc, d]
    node_graph: jnp.ndarray  # [v_loc] GLOBAL graph ids (padding -> n_graphs)
    node_mask: jnp.ndarray  # [v_loc] bool
    edge_mask: jnp.ndarray  # [e_loc] bool
    edge_graph: jnp.ndarray  # [e_loc]
    edge_ids: jnp.ndarray  # [e_loc] global edge id (-1 for padding slots)
    rev: jnp.ndarray  # [e_loc] local reverse-edge index
    src_slot: jnp.ndarray  # [e_loc] into the gather buffer
    dst_slot: jnp.ndarray  # [e_loc] into the partial buffer
    scatter_send_slot: jnp.ndarray  # [n, b_cap] into the partial buffer
    scatter_recv_tgt: jnp.ndarray  # [n, b_cap] into the accumulate buffer
    gather_send_slot: jnp.ndarray  # [n, b_cap] into [v_loc]+zero row
    num_graphs_real: jnp.ndarray  # [] i32
    v_loc: int = struct.field(pytree_node=False, default=0)
    h_cap: int = struct.field(pytree_node=False, default=0)
    b_cap: int = struct.field(pytree_node=False, default=0)
    n_shards: int = struct.field(pytree_node=False, default=1)
    n_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def num_nodes(self) -> int:
        return self.v_loc

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[-1]

    def update(self, **kwargs) -> "HaloShard":
        return self.replace(**kwargs)


def partition_edges_halo(
    bg: BatchedGraph,
    n_shards: int,
    pair_cap: int | None = None,
    b_cap: int | None = None,
    h_cap: int | None = None,
) -> list[HaloShard]:
    """Split a (host, numpy) padded batch into halo shards.

    ``pair_cap``/``b_cap``/``h_cap`` optionally OVERRIDE the computed
    per-shard capacities (they must be >= the computed minimums) so that
    shards from different batches share one pytree structure — required
    when stacking several data groups into one SPMD batch
    (:func:`notorch_tpu.parallel.partition.build_halo_spmd_batch`).

    Nodes: contiguous blocks of ``V/n`` (relabel/permute nodes beforehand for
    a better cut — the partition quality lever lives entirely host-side).
    Edges: each reverse PAIR is assigned to the shard owning its first
    endpoint (locality-aware, so boundary sets stay proportional to the cut,
    not to the batch), keeping ``rev`` a local pairwise swap; per-shard edge
    lists are padded to a common even cap. Boundary metadata is built from
    the real (unmasked) edges; padding edge slots map to trash slots on both
    sides.
    """
    V, E = bg.num_nodes, bg.num_edges
    if V % n_shards:
        raise ValueError(f"node cap {V} must divide into {n_shards} shards")
    v_loc = V // n_shards
    src = np.asarray(bg.src)
    dst = np.asarray(bg.dst)
    emask = np.asarray(bg.edge_mask)
    rev = np.asarray(bg.rev)

    # real edges come in interleaved reverse pairs (rev[2p] == 2p+1)
    real_pairs = np.nonzero(emask[0::2])[0]
    if not (rev[2 * real_pairs] == 2 * real_pairs + 1).all():
        raise ValueError("halo partitioning requires interleaved reverse pairs")
    pair_owner = src[2 * real_pairs] // v_loc
    assigned = [real_pairs[pair_owner == s] for s in range(n_shards)]
    pair_cap_min = max((len(a) for a in assigned), default=0)
    pair_cap_min = max(-(-pair_cap_min // 4) * 4, 4)  # even e_loc, 8-aligned
    if pair_cap is None:
        pair_cap = pair_cap_min
    elif pair_cap < pair_cap_min:
        raise ValueError(f"pair_cap {pair_cap} < required {pair_cap_min}")
    e_loc = 2 * pair_cap

    # boundary[s][p]: nodes owned by p that shard s touches (src or dst).
    # Reverse pairs are co-located, so the src- and dst-touched sets
    # coincide — ONE boundary set serves both exchanges.
    sel_edges = []
    boundary: list[list[np.ndarray]] = []
    for s in range(n_shards):
        eids = np.stack([2 * assigned[s], 2 * assigned[s] + 1], axis=1).reshape(-1)
        sel = np.full(e_loc, -1, dtype=np.int64)
        sel[: len(eids)] = eids
        sel_edges.append(sel)
        touched = np.unique(np.concatenate([src[eids], dst[eids]]))
        rows = []
        for p in range(n_shards):
            own = touched[(touched // v_loc) == p]
            rows.append(own if p != s else np.empty(0, np.int64))
        boundary.append(rows)

    b_cap_min = max((len(r) for rows in boundary for r in rows), default=0)
    h_cap_min = max((sum(len(r) for r in rows) for rows in boundary), default=0)
    if b_cap is None:
        b_cap = b_cap_min
    elif b_cap < b_cap_min:
        raise ValueError(f"b_cap {b_cap} < required {b_cap_min}")
    if h_cap is None:
        h_cap = h_cap_min
    elif h_cap < h_cap_min:
        raise ValueError(f"h_cap {h_cap} < required {h_cap_min}")

    # local rev is always the pairwise swap (pairs stay adjacent)
    rev_local = np.arange(e_loc, dtype=np.int32)
    rev_local[0::2] += 1
    rev_local[1::2] -= 1

    t_e = np.asarray(bg.edge_feats).shape[1]
    shards = []
    for s in range(n_shards):
        sel = sel_edges[s]
        real = sel >= 0
        safe = np.maximum(sel, 0)
        trash_partial = v_loc + h_cap  # partial-buffer trash slot

        # halo-out slot of node v on shard s (owner-major, id-sorted)
        halo_slot: dict[int, int] = {}
        for p in range(n_shards):
            for v in boundary[s][p]:
                halo_slot[int(v)] = v_loc + len(halo_slot)

        d_global = np.where(real, dst[safe], 0)
        dst_slot = np.full(e_loc, trash_partial, dtype=np.int32)
        own_d = (d_global // v_loc) == s
        dst_slot[real & own_d] = (d_global - s * v_loc)[real & own_d]
        for e in np.nonzero(real & ~own_d)[0]:
            dst_slot[e] = halo_slot[int(d_global[e])]

        # gather-buffer slots: [0, v_loc) own, v_loc zero row, then halo-in
        # rows at v_loc + 1 + q * b_cap + b (q = owner, b = sort position)
        s_global = np.where(real, src[safe], 0)
        src_slot = np.full(e_loc, v_loc, dtype=np.int32)  # padding -> zero row
        own_s = (s_global // v_loc) == s
        src_slot[real & own_s] = (s_global - s * v_loc)[real & own_s]
        halo_in_pos = {
            int(v): v_loc + 1 + q * b_cap + b
            for q in range(n_shards)
            for b, v in enumerate(boundary[s][q])
        }
        for e in np.nonzero(real & ~own_s)[0]:
            src_slot[e] = halo_in_pos[int(s_global[e])]

        scatter_send = np.full((n_shards, max(b_cap, 1)), trash_partial, np.int32)
        scatter_recv = np.full((n_shards, max(b_cap, 1)), v_loc, np.int32)
        gather_send = np.full((n_shards, max(b_cap, 1)), v_loc, np.int32)
        for p in range(n_shards):
            # rows I send to owner p (exchange 1): my halo slots of p's nodes
            for b, v in enumerate(boundary[s][p]):
                scatter_send[p, b] = halo_slot[int(v)]
            # rows I receive from q (exchange 1): q's boundary nodes owned by
            # me, in q's (id-sorted) order -> accumulate into my own block
            for b, v in enumerate(boundary[p][s]):
                scatter_recv[p, b] = int(v) - s * v_loc
            # rows peer p needs from me (exchange 2): same set, same order
            for b, v in enumerate(boundary[p][s]):
                gather_send[p, b] = int(v) - s * v_loc

        edge_feats = np.where(
            real[:, None], np.asarray(bg.edge_feats)[safe], np.zeros((1, t_e))
        ).astype(np.asarray(bg.edge_feats).dtype)
        edge_graph = np.where(
            real, np.asarray(bg.edge_graph)[safe], bg.n_graphs
        ).astype(np.int32)

        shards.append(
            HaloShard(
                node_feats=np.asarray(bg.node_feats)[s * v_loc : (s + 1) * v_loc],
                edge_feats=edge_feats,
                node_graph=np.asarray(bg.node_graph)[s * v_loc : (s + 1) * v_loc],
                node_mask=np.asarray(bg.node_mask)[s * v_loc : (s + 1) * v_loc],
                edge_mask=real,
                edge_graph=edge_graph,
                edge_ids=sel.astype(np.int32),
                rev=rev_local,
                src_slot=src_slot,
                dst_slot=dst_slot,
                scatter_send_slot=scatter_send,
                scatter_recv_tgt=scatter_recv,
                gather_send_slot=gather_send,
                num_graphs_real=np.asarray(bg.num_graphs_real),
                v_loc=v_loc,
                h_cap=h_cap,
                b_cap=b_cap,
                n_shards=n_shards,
                n_graphs=bg.n_graphs,
            )
        )
    return shards


def halo_reduce(m: jnp.ndarray, shard: HaloShard, axis: str) -> jnp.ndarray:
    """E->V reduction with boundary scatter: returns the COMPLETE message
    sums for this shard's owned node block ``[v_loc, d]``."""
    partial = segment_sum(m, shard.dst_slot, shard.v_loc + shard.h_cap + 1)
    own = partial[: shard.v_loc]
    if shard.b_cap == 0:
        return own
    send = partial[shard.scatter_send_slot]  # [n, B, d]
    recv = jax.lax.all_to_all(send, axis, 0, 0)
    own_ext = jnp.concatenate([own, jnp.zeros_like(own[:1])], axis=0)
    own_ext = own_ext.at[shard.scatter_recv_tgt.reshape(-1)].add(
        recv.reshape(-1, m.shape[-1])
    )
    return own_ext[: shard.v_loc]


def halo_gather(x_own: jnp.ndarray, shard: HaloShard, axis: str) -> jnp.ndarray:
    """V->E preparation: extend the owned node rows with a zero row and the
    halo-in rows fetched from their owners; index with ``shard.src_slot``."""
    ext0 = jnp.concatenate([x_own, jnp.zeros_like(x_own[:1])], axis=0)
    if shard.b_cap == 0:
        return ext0
    send = ext0[shard.gather_send_slot]  # [n, B, d]
    halo = jax.lax.all_to_all(send, axis, 0, 0)
    return jnp.concatenate([ext0, halo.reshape(-1, x_own.shape[-1])], axis=0)


def halo_mpnn_block(
    node_embed: jnp.ndarray,  # [v_loc, d]
    edge_embed: jnp.ndarray,  # [e_loc, d]
    shard: HaloShard,
    weights: jnp.ndarray,  # [depth, d, d]
    biases: jnp.ndarray,  # [depth, d]
    axis: str,
    residual: bool = True,
    act: Callable = jax.nn.relu,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The D-MPNN block over a halo shard. Returns (node_hiddens [v_loc, d],
    edge_hiddens [e_loc, d]); real rows match the unsharded recurrence
    exactly.

    Uses the linearity ``(m_v[src] - m[rev]) @ W == (m_v @ W)[src] -
    (m @ W)[rev]``: the E-sized ``m @ W`` (reverse-message term) is issued
    BEFORE exchange 1 and has no dependence on it, so the boundary DMA
    overlaps the MXU work; only the small owner-side ``[v_loc, d] @ [d, d]``
    sits between the exchanges.
    """
    depth = weights.shape[0]
    ext = halo_gather(node_embed, shard, axis)
    h = ext[shard.src_slot] + edge_embed
    for layer in range(depth):
        m = act(h)
        mW = m @ weights[layer]  # E-sized; overlaps the scatter exchange
        m_v = halo_reduce(m, shard, axis)  # exchange 1 (boundary partials)
        m_vW = m_v @ weights[layer]  # owner-side transform
        ext = halo_gather(m_vW, shard, axis)  # exchange 2 (boundary totals)
        out = ext[shard.src_slot] - mW[shard.rev] + biases[layer]
        h = h + out if residual else out
    node_h = halo_reduce(h, shard, axis)
    return node_h, h


class HaloChempropBlock(nn.Module):
    """Linen wrapper owning the stacked layer weights; consumes and returns a
    :class:`HaloShard` so it drops into the declarative model composition in
    place of ``ChempropBlock`` (same recurrence — reference
    ``notorch/nn/gnn/chemprop.py:28-88`` — partitioned)."""

    axis: str
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    depth: int = 3
    residual: bool = True
    act: Callable = nn.relu
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, shard: HaloShard, training: bool = False) -> HaloShard:
        d = self.hidden_dim
        scale = 1.0 / np.sqrt(d)
        weights = self.param(
            "weights",
            lambda key: jax.random.uniform(
                key, (self.depth, d, d), self.param_dtype, -scale, scale
            ),
        )
        biases = self.param(
            "biases", lambda key: jnp.zeros((self.depth, d), self.param_dtype)
        )
        node_h, edge_h = halo_mpnn_block(
            shard.node_feats, shard.edge_feats, shard, weights, biases,
            self.axis, residual=self.residual, act=self.act,
        )
        return shard.update(node_feats=node_h, edge_feats=edge_h)


def comm_bytes_per_step(shard: HaloShard, hidden_dim: int, depth: int,
                        dtype_bytes: int = 4) -> int:
    """Bytes each shard exchanges per step: 2 all_to_alls per layer plus the
    initial embed gather and final reduce (depth + 1 of each)."""
    per_exchange = shard.n_shards * shard.b_cap * hidden_dim * dtype_bytes
    return 2 * (depth + 1) * per_exchange

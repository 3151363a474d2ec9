"""Graph partitioning for multi-chip execution.

Two axes (SURVEY §2.2 "consequence for the TPU build"):

- **data**: independent molecule batches per device — the DDP analog.
- **graph** (edge partitioning): ONE batched graph's *edge* array split
  across devices, node state replicated within the group; the E->V
  reductions are combined with an ICI ``psum`` (the halo exchange). This is
  the graph analog of sequence/context parallelism and is how a single
  giant batch (PCQM4Mv2-scale) spans chips.

Edges are produced in (u,v),(v,u) pairs, so any even-offset contiguous split
keeps each edge's reverse partner in the same shard — ``rev`` stays a local
index and the D-MPNN's reverse-message gather needs no communication.
"""

from __future__ import annotations

import numpy as np

from notorch_tpu.data.graph import BatchedGraph, Graph, pad_graphs

__all__ = ["shard_graph_edges", "build_spmd_batch", "stack_pytrees"]


def shard_graph_edges(bg: BatchedGraph, n_shards: int) -> list[BatchedGraph]:
    """Split a (host, numpy) padded batch into ``n_shards`` edge shards.

    Node arrays are replicated; edge arrays are contiguous slices of length
    ``E_cap / n_shards`` (must divide evenly and be even so reverse pairs
    stay together); ``rev`` is rebased to shard-local indices.
    """
    E = bg.num_edges
    if E % n_shards != 0:
        raise ValueError(f"edge_cap {E} not divisible by {n_shards} shards")
    per = E // n_shards
    if per % 2 != 0:
        raise ValueError(f"per-shard edge count {per} must be even to keep rev pairs local")

    from notorch_tpu.data.graph import build_in_edges

    min_k = bg.in_edges.shape[1] if bg.in_edges is not None else 8
    shards = []
    for i in range(n_shards):
        sl = slice(i * per, (i + 1) * per)
        dst = np.asarray(bg.dst[sl])
        mask = np.asarray(bg.edge_mask[sl])
        shards.append(
            bg.replace(
                edge_feats=bg.edge_feats[sl],
                src=bg.src[sl],
                dst=bg.dst[sl],
                rev=bg.rev[sl] - i * per,
                edge_graph=bg.edge_graph[sl],
                edge_mask=bg.edge_mask[sl],
                # per-shard incoming-edge table with shard-local edge ids
                in_edges=build_in_edges(dst, mask, bg.num_nodes, min_k=min_k),
            )
        )
    return shards


def stack_pytrees(trees: list):
    """Stack identical pytrees along a new leading axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def build_spmd_batch(
    graph_groups: list[list[Graph]],
    target_arrays: dict[str, np.ndarray] | None,
    node_cap: int,
    edge_cap: int,
    graph_cap: int,
    n_edge_shards: int = 1,
    extra_inputs: dict[str, list[np.ndarray]] | None = None,
):
    """Build a stacked SPMD batch dict shaped ``[n_data, n_edge_shards, ...]``
    on every leaf (node-side and target leaves are tiled across the edge-shard
    axis), so a single ``P(data_axis, graph_axis)`` prefix spec shards the
    whole pytree under ``shard_map``.

    ``graph_groups[i]`` is the molecule list for data-shard ``i``;
    ``target_arrays[name][i]`` the matching ``[graph_cap, t]`` target rows.
    ``extra_inputs[name][i]`` are node-side input arrays (e.g. the masked
    pretraining labels, ``[node_cap]``) stored as ``inputs.<name>`` and
    replicated across the edge-shard axis.
    """
    data_entries = []
    for gi, graphs in enumerate(graph_groups):
        bg = pad_graphs(graphs, node_cap, edge_cap, graph_cap=graph_cap, np_out=True)
        shards = shard_graph_edges(bg, n_edge_shards)
        entry = {"inputs.G": stack_pytrees(shards)}
        tiled = lambda x: np.broadcast_to(x, (n_edge_shards,) + x.shape).copy()
        for name, arr in (target_arrays or {}).items():
            rows = np.asarray(arr[gi], dtype=np.float32)
            mask = ~np.isnan(rows)
            entry[f"targets.{name}"] = tiled(np.nan_to_num(rows, nan=0.0))
            entry[f"targets.{name}_mask"] = tiled(mask)
        for name, arrs in (extra_inputs or {}).items():
            entry[f"inputs.{name}"] = tiled(np.asarray(arrs[gi]))
        # node-side leaves of the graph are per-shard already identical
        # (stack_pytrees tiled them); nothing else to do
        data_entries.append(entry)
    return stack_pytrees(data_entries)

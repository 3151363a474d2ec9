"""Graph partitioning for multi-chip execution.

Three schemes, by boundary traffic (SURVEY §2.2 "consequence for the TPU
build"; BASELINE north star):

- **data**: independent molecule batches per device — the DDP analog.
- **molecule partitioning** (the production graph axis): whole molecules are
  assigned to shards, nodes AND edges together. Molecular batches are
  disjoint unions, so message passing is **fully local — zero boundary
  traffic**; the only cross-shard communication of the whole forward is one
  ``psum`` of the [G, d] per-graph readout partials (O(G·d) per *step*,
  vs the replicated scheme's O(V·d) per *layer*). See
  :func:`partition_molecules` / :func:`build_molecule_spmd_batch` and the
  ``psum_axis`` option on :mod:`notorch_tpu.nn.agg`.
- **edge partitioning with replicated nodes** (legacy/simple): ONE batched
  graph's *edge* array split across devices, node state replicated; E->V
  reductions combined with a full ``psum`` per layer
  (``ChempropLayer.psum_axis``). Correct but communication-heavy; kept for
  comparison and as the fallback when molecules exceed a shard.
- **edge partitioning with boundary halo exchange** (giant single graphs):
  nodes sharded in contiguous blocks, edges assigned with their reverse
  pairs, and only *boundary* node rows exchanged via ``all_to_all`` — see
  :mod:`notorch_tpu.parallel.halo`.

Edges are produced in (u,v),(v,u) pairs, so any even-offset contiguous split
keeps each edge's reverse partner in the same shard — ``rev`` stays a local
index and the D-MPNN's reverse-message gather needs no communication.
"""

from __future__ import annotations

import numpy as np

from notorch_tpu.data.graph import BatchedGraph, Graph, pad_graphs

__all__ = [
    "shard_graph_edges",
    "build_spmd_batch",
    "stack_pytrees",
    "partition_molecules",
    "shard_graph_molecules",
    "build_molecule_spmd_batch",
    "build_halo_spmd_batch",
]


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


def partition_molecules(graphs: list[Graph], n_shards: int) -> list[list[int]]:
    """Assign whole molecules to shards, balancing by edge count (LPT greedy
    bin packing). Molecules are disjoint graph components, so a shard owns
    every node and edge of its molecules — the boundary set is EMPTY and
    message passing needs no communication at all.

    Returns per-shard lists of molecule indices (each sorted ascending).
    """
    order = np.argsort([-g.num_edges for g in graphs], kind="stable")
    loads = np.zeros(n_shards, dtype=np.int64)
    assign: list[list[int]] = [[] for _ in range(n_shards)]
    for i in order:
        s = int(np.argmin(loads))
        assign[s].append(int(i))
        loads[s] += max(graphs[i].num_edges, 1)
    return [sorted(a) for a in assign]


def shard_graph_molecules(
    graphs: list[Graph],
    n_shards: int,
    node_cap: int,
    edge_cap: int,
    graph_cap: int,
    assign: list[list[int]] | None = None,
) -> list[BatchedGraph]:
    """Partition molecules across ``n_shards`` and pad each shard to the
    SAME (per-shard) caps, relabeling graph ids to GLOBAL slots so per-shard
    readout partials ``psum`` into the global [graph_cap, d] embedding.

    ``node_cap``/``edge_cap`` are per-shard caps. Global graph slot of the
    j-th molecule on shard s is its index in the original ``graphs`` list;
    padding slots map to the global trash slot ``graph_cap``.
    """
    if assign is None:
        assign = partition_molecules(graphs, n_shards)
    shards = []
    for idx in assign:
        sub = [graphs[i] for i in idx]
        if sub:
            bg = pad_graphs(sub, node_cap, edge_cap, graph_cap=len(sub), np_out=True)
            lut = np.asarray(idx + [graph_cap], dtype=np.int32)  # local -> global
        else:
            # empty shard: a dummy pure-padding molecule with matching
            # feature-family widths so stacked shard pytrees line up
            t_v = graphs[0].node_types.shape[1] if graphs else 1
            t_e = graphs[0].edge_types.shape[1] if graphs else 1
            bg = pad_graphs(
                [Graph(
                    node_types=np.zeros((1, t_v), np.int32),
                    edge_types=np.zeros((0, t_e), np.int32),
                    src=np.zeros(0, np.int32),
                    dst=np.zeros(0, np.int32),
                    rev=np.zeros(0, np.int32),
                )],
                node_cap, edge_cap, graph_cap=1, np_out=True,
            )
            # the dummy molecule is pure padding: every id -> trash
            lut = np.asarray([graph_cap, graph_cap], dtype=np.int32)
            bg = bg.replace(
                node_mask=np.zeros_like(np.asarray(bg.node_mask)),
                edge_mask=np.zeros_like(np.asarray(bg.edge_mask)),
                num_graphs_real=np.asarray(0, np.int32),
            )
        shards.append(
            bg.replace(
                node_graph=lut[np.asarray(bg.node_graph)],
                edge_graph=lut[np.asarray(bg.edge_graph)],
                n_graphs=graph_cap,
            )
        )
    return shards


def build_molecule_spmd_batch(
    graph_groups: list[list[Graph]],
    target_arrays: dict[str, np.ndarray] | None,
    node_cap: int,
    edge_cap: int,
    graph_cap: int,
    n_graph_shards: int = 1,
    extra_inputs: dict[str, list[np.ndarray]] | None = None,
    node_attrs: tuple[str, ...] = (),
):
    """Like :func:`build_spmd_batch` but the graph axis carries MOLECULE
    partitions (sharded nodes + edges, zero-boundary message passing) instead
    of replicated-node edge shards. ``node_cap``/``edge_cap`` are per-shard
    caps. Targets are tiled across the graph axis (the readout psum makes the
    per-graph embedding replicated, so the loss tail is replicated too —
    same gradient-exactness gating as the legacy scheme).

    ``node_attrs``: names of per-node int attributes carried on the ragged
    ``Graph`` objects (e.g. the masked-pretraining ``node_labels``); they are
    collated PER SHARD, aligned with each shard's local node layout, and
    stored as ``inputs.<name>`` (padding -> -1).
    """
    data_entries = []
    for gi, graphs in enumerate(graph_groups):
        assign = partition_molecules(graphs, n_graph_shards)
        shards = shard_graph_molecules(
            graphs, n_graph_shards, node_cap, edge_cap, graph_cap, assign=assign
        )
        entry = {"inputs.G": stack_pytrees(shards)}
        tiled = lambda x: np.broadcast_to(x, (n_graph_shards,) + x.shape).copy()
        for name, arr in (target_arrays or {}).items():
            rows = np.asarray(arr[gi], dtype=np.float32)
            mask = ~np.isnan(rows)
            entry[f"targets.{name}"] = tiled(np.nan_to_num(rows, nan=0.0))
            entry[f"targets.{name}_mask"] = tiled(mask)
        for name, arrs in (extra_inputs or {}).items():
            entry[f"inputs.{name}"] = tiled(np.asarray(arrs[gi]))
        for attr in node_attrs or ():
            rows = []
            for idx in assign:
                vals = np.full(node_cap, -1, dtype=np.int32)
                off = 0
                for i in idx:
                    v = np.asarray(getattr(graphs[i], attr))
                    vals[off : off + len(v)] = v
                    off += len(v)
                rows.append(vals)
            entry[f"inputs.{attr}"] = np.stack(rows)
        data_entries.append(entry)
    return stack_pytrees(data_entries)


def build_halo_spmd_batch(
    graph_groups: list[list[Graph]],
    target_arrays: dict[str, np.ndarray] | None,
    node_cap: int,
    edge_cap: int,
    graph_cap: int,
    n_shards: int = 1,
    extra_inputs: dict[str, list[np.ndarray]] | None = None,
    pair_cap: int | None = None,
    b_cap: int | None = None,
    h_cap: int | None = None,
):
    """Like :func:`build_molecule_spmd_batch` but the graph axis carries
    boundary-HALO edge partitions (:mod:`notorch_tpu.parallel.halo`): each
    data group is padded into ONE flat disjoint-union graph (``node_cap``
    must divide evenly into ``n_shards`` node blocks) and split with
    :func:`partition_edges_halo`. Use when single graphs exceed a shard —
    message passing exchanges only boundary rows (2 ``all_to_all``s/layer).

    Targets are tiled across the graph axis: the psum-aware readout makes
    the per-graph embedding replicated, so the loss tail is replicated and
    the :class:`~notorch_tpu.parallel.spmd.SpmdTrainer` shard-0 gating gives
    gradients exactly equal to the unsharded computation.
    """
    from notorch_tpu.parallel.halo import partition_edges_halo

    if node_cap % n_shards:
        raise ValueError(
            f"node_cap {node_cap} must divide into {n_shards} halo shards"
        )
    bgs = [
        pad_graphs(graphs, node_cap, edge_cap, graph_cap=graph_cap, np_out=True)
        for graphs in graph_groups
    ]
    # shard capacities depend on each group's edge distribution; use the
    # maxima so shards from every data group share ONE pytree structure
    # (callers pass fixed caps for one compiled shape ACROSS batches — see
    # halo_spmd_caps)
    if len(bgs) > 1 and (pair_cap is None or b_cap is None or h_cap is None):
        probes = [partition_edges_halo(bg, n_shards) for bg in bgs]
        pair_cap = pair_cap or max(p[0].num_edges // 2 for p in probes)
        b_cap = b_cap if b_cap is not None else max(p[0].b_cap for p in probes)
        h_cap = h_cap if h_cap is not None else max(p[0].h_cap for p in probes)
    data_entries = []
    for gi, (graphs, bg) in enumerate(zip(graph_groups, bgs)):
        shards = partition_edges_halo(
            bg, n_shards, pair_cap=pair_cap, b_cap=b_cap, h_cap=h_cap
        )
        entry = {"inputs.G": stack_pytrees(shards)}
        tiled = lambda x: np.broadcast_to(x, (n_shards,) + x.shape).copy()
        for name, arr in (target_arrays or {}).items():
            rows = np.asarray(arr[gi], dtype=np.float32)
            mask = ~np.isnan(rows)
            entry[f"targets.{name}"] = tiled(np.nan_to_num(rows, nan=0.0))
            entry[f"targets.{name}_mask"] = tiled(mask)
        for name, arrs in (extra_inputs or {}).items():
            entry[f"inputs.{name}"] = tiled(np.asarray(arrs[gi]))
        data_entries.append(entry)
    return stack_pytrees(data_entries)


def halo_spmd_caps(
    all_graph_groups,
    node_cap: int,
    edge_cap: int,
    graph_cap: int,
    n_shards: int,
) -> tuple[int, int, int]:
    """Max ``(pair_cap, b_cap, h_cap)`` over every prospective batch — pass
    to :func:`build_halo_spmd_batch` so a whole training run compiles ONE
    step shape."""
    from notorch_tpu.parallel.halo import partition_edges_halo

    pc = bc = hc = 0
    for groups in all_graph_groups:
        for graphs in groups:
            bg = pad_graphs(
                graphs, node_cap, edge_cap, graph_cap=graph_cap, np_out=True
            )
            s = partition_edges_halo(bg, n_shards)[0]
            pc = max(pc, s.num_edges // 2)
            bc = max(bc, s.b_cap)
            hc = max(hc, s.h_cap)
    return pc, bc, hc


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

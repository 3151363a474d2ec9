"""Benchmark: edges/sec/chip of D-MPNN message passing (the north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the depth-3 message-passing block is iterated inside a single
jitted ``lax.fori_loop`` with the edge state fed back between iterations, so
executions serialize on-device and dispatch overhead amortizes. The loop
result is reduced to a scalar INSIDE the jit and fetched to the host — on
tunneled platforms ``block_until_ready`` can return before device work
completes (and orphaned queued work can wedge the chip), so the scalar fetch
is the only reliable sync. "Edges/s" counts edge-layer updates:
real_edges x depth x iters / time.

``vs_baseline``: the reference implementation (torch + torch_scatter +
Lightning) is not installable here; the baseline is the reference-equivalent
recurrence implemented with torch.index_add on this host's CPU — the same
semantics the reference executes, on the hardware available to it in this
image.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _torch_cpu_baseline(bg, d: int, depth: int, iters: int = 5) -> float:
    """Reference-equivalent D-MPNN recurrence: torch CPU, index_add scatter."""
    import torch

    E, V = bg.num_edges, bg.num_nodes
    g = torch.Generator().manual_seed(0)
    node_feats = torch.randn(V, d, generator=g)
    edge_feats = torch.randn(E, d, generator=g)
    src = torch.from_numpy(np.asarray(bg.src)).long()
    dst = torch.from_numpy(np.asarray(bg.dst)).long()
    rev = torch.from_numpy(np.asarray(bg.rev)).long()
    Ws = [torch.randn(d, d, generator=g) / d**0.5 for _ in range(depth)]
    bs = [torch.zeros(d) for _ in range(depth)]

    def run():
        h = node_feats[src] + edge_feats
        for W, b in zip(Ws, bs):
            m = torch.relu(h)
            node_m = torch.zeros(V, d).index_add_(0, dst, m)
            h = h + (node_m[src] - m[rev]) @ W + b
        return torch.zeros(V, d).index_add_(0, dst, h)

    run()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    real_edges = int(np.asarray(bg.edge_mask).sum())
    return real_edges * depth / dt


def main() -> None:
    import csv
    import os

    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden = 256
    depth = 3
    chain = 50  # block applications per timed device call

    path = os.path.join(os.path.dirname(__file__), "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    total_v = sum(g.num_nodes for g in graphs) + 1
    total_e = sum(g.num_edges for g in graphs)
    v_cap = -(-total_v // 1024) * 1024
    e_cap = -(-total_e // 2048) * 2048
    bg = pad_graphs(graphs, v_cap, e_cap, graph_cap=len(graphs))

    embed = GraphEmbedding(hidden_dim=hidden)
    block = ChempropBlock(hidden_dim=hidden, depth=depth)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, bg)
    G = embed.apply(ev, bg)
    bv = block.init(key, G)

    @jax.jit
    def run_chain(variables, G):
        def body(_, ef):
            out = block.apply(variables, G.update(edge_feats=ef))
            return out.edge_feats
        final = jax.lax.fori_loop(0, chain, body, G.edge_feats)
        return jnp.sum(final.astype(jnp.float32))  # scalar: forces real sync on fetch

    float(run_chain(bv, G))  # compile + warm + drain queue

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_chain(bv, G))  # host fetch = true completion
        times.append(time.perf_counter() - t0)
    dt = min(times)

    real_edges = int(np.asarray(bg.edge_mask).sum())
    edges_per_sec = real_edges * depth * chain / dt

    baseline = _torch_cpu_baseline(bg, hidden, depth)

    print(
        json.dumps(
            {
                "metric": "dmpnn_message_passing_edges_per_sec_per_chip",
                "value": round(edges_per_sec, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

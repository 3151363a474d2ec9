"""Benchmark: edges/sec/chip of D-MPNN message passing (the north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` compares
against a measured torch-CPU-equivalent estimate recorded on first principles:
we report vs_baseline = value / BASELINE_EDGES_PER_SEC where the baseline
constant is the reference-stack throughput measured for the same batch on
this host's CPU via the pinned numpy oracle (conservative stand-in for the
unavailable torch_scatter reference).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure_oracle_cpu(bg, weights, biases, iters: int = 3) -> float:
    """Reference-equivalent throughput: the same recurrence via numpy on host
    CPU (the reference's torch_scatter path is unavailable in this image)."""
    import sys
    sys.path.insert(0, "tests")
    from oracle import chemprop_block

    node_feats = np.random.default_rng(0).normal(size=(bg.num_nodes, weights[0].shape[0]))
    edge_feats = np.random.default_rng(1).normal(size=(bg.num_edges, weights[0].shape[0]))
    node_feats = node_feats.astype(np.float32)
    edge_feats = edge_feats.astype(np.float32)
    src, dst, rev = (np.asarray(x) for x in (bg.src, bg.dst, bg.rev))
    chemprop_block(node_feats, edge_feats, src, dst, rev, weights, biases)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        chemprop_block(node_feats, edge_feats, src, dst, rev, weights, biases)
    dt = (time.perf_counter() - t0) / iters
    return bg.num_edges * len(weights) / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden = 256
    depth = 3

    # a realistic large batch: ~512 drug-like molecules
    import csv
    import os

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
    def run(variables, G):
        return block.apply(variables, G).edge_feats

    out = run(bv, G)
    out.block_until_ready()

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(bv, G)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    real_edges = int(np.asarray(bg.edge_mask).sum())
    edges_per_sec = real_edges * depth / dt

    # baseline: pinned numpy oracle on host CPU (reference-equivalent path)
    Ws = [np.asarray(bv["params"][f"layer_{i}"]["update"]["kernel"]) for i in range(depth)]
    bs = [np.asarray(bv["params"][f"layer_{i}"]["update"]["bias"]) for i in range(depth)]
    small = pad_graphs(graphs[:128], v_cap // 4, e_cap // 4, graph_cap=128, np_out=True)
    baseline = _measure_oracle_cpu(small, Ws, bs)

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

"""Scaling-efficiency benchmark: edges/sec across mesh sizes.

The BASELINE north star asks for >=85% edges/s scaling efficiency from 1
chip -> 1 host -> N hosts. This harness measures the SPMD train step (data
parallel x optional edge partitioning) at increasing device counts on
whatever mesh is available and reports efficiency relative to the
single-device rate.

Single-chip environments (like this image's tunneled v5e) can still run the
logic end-to-end on virtual CPU devices for wiring validation:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python bench_scaling.py --cpu --devices 1 2 4 8

Real numbers require a multi-chip slice.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(n_devices: int, n_edge_shards: int, per_shard: int, steps: int, hidden: int):
    import jax
    import jax.numpy as jnp
    import optax

    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.parallel.mesh import make_mesh
    from notorch_tpu.parallel.partition import build_spmd_batch
    from notorch_tpu.parallel.spmd import SpmdTrainer
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    import csv
    import os

    n_data = n_devices // n_edge_shards
    mesh = make_mesh(
        {"data": n_data, "graph": n_edge_shards}, devices=jax.devices()[:n_devices]
    )

    path = os.path.join(os.path.dirname(__file__), "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis[: n_data * per_shard]]
    groups = [graphs[i * per_shard : (i + 1) * per_shard] for i in range(n_data)]

    max_v = max(sum(g.num_nodes for g in grp) for grp in groups) + 1
    max_e = max(sum(g.num_edges for g in grp) for grp in groups)
    node_cap = -(-max_v // 256) * 256
    q = 2 * n_edge_shards
    edge_cap = -(-max_e // (256 * q)) * 256 * q
    real_edges = sum(g.num_edges for grp in groups for g in grp)

    rng = np.random.default_rng(0)
    targets = {"y": rng.normal(size=(n_data, per_shard, 1)).astype(np.float32)}
    batch = build_spmd_batch(
        groups, targets, node_cap=node_cap, edge_cap=edge_cap, graph_cap=per_shard,
        n_edge_shards=n_edge_shards,
    )

    graph_axis = "graph" if n_edge_shards > 1 else None
    model = build_dmpnn(
        hidden_dim=hidden, depth=3, graph_axis=graph_axis, optimizer=optax.adam(1e-3)
    )
    trainer = SpmdTrainer(model, mesh, data_axis="data", graph_axis=graph_axis)
    state = trainer.init(jax.random.PRNGKey(0), batch)

    state, logs = trainer.train_step(state, batch)
    float(logs["train/loss"])  # sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, logs = trainer.train_step(state, batch)
    float(logs["train/loss"])  # sync
    dt = (time.perf_counter() - t0) / steps
    return real_edges * 3 / dt  # edge-layer updates per second per step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1])
    parser.add_argument("--edge-shards", type=int, default=1)
    parser.add_argument("--per-shard", type=int, default=64)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = {}
    for n in args.devices:
        eps = measure(n, args.edge_shards if n >= args.edge_shards else 1,
                      args.per_shard, args.steps, args.hidden)
        results[n] = eps
    base = results[min(results)] / min(results)
    report = {
        "metric": "spmd_train_step_edges_per_sec",
        "per_device_count": {str(k): round(v, 1) for k, v in results.items()},
        "scaling_efficiency": {
            str(k): round(v / (base * k), 3) for k, v in results.items()
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()

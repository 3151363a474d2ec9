"""Example: SPMD training — data parallel x edge-partitioned message passing.

Runs on any mesh; on a CPU-only machine emulate devices first:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/train_spmd.py tests/data/lipo.csv --target lipo --cpu
"""

import argparse

import jax
import optax
import pandas as pd

from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.parallel.loader import ShardedDataLoader, spmd_fit
from notorch_tpu.parallel.mesh import make_mesh
from notorch_tpu.parallel.spmd import SpmdTrainer
from notorch_tpu.training.logging import StdoutLogger
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--smiles-col", default="smiles")
    p.add_argument("--target", default="y")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--data-shards", type=int, default=4)
    p.add_argument("--edge-shards", type=int, default=2)
    p.add_argument("--per-shard", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    mesh = make_mesh({"data": args.data_shards, "graph": args.edge_shards})
    graph_axis = "graph" if args.edge_shards > 1 else None

    df = pd.read_csv(args.csv)
    ds = MolecularDataset(
        df,
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key=args.smiles_col)
        },
        targets={"y": TargetSpec(columns=[args.target], task="regression")},
    )

    model = build_dmpnn(
        hidden_dim=128, depth=3, graph_axis=graph_axis, optimizer=optax.adam(1e-3)
    )
    trainer = SpmdTrainer(model, mesh, data_axis="data", graph_axis=graph_axis)
    loader = ShardedDataLoader(
        ds,
        n_data=args.data_shards,
        per_shard_graphs=args.per_shard,
        n_edge_shards=args.edge_shards,
        shuffle=True,
    )
    state = trainer.init(jax.random.PRNGKey(0), next(iter(loader)))
    state, history = spmd_fit(trainer, state, loader, epochs=args.epochs, log_fn=StdoutLogger())


if __name__ == "__main__":
    main()

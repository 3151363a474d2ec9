"""Sharded loader + SPMD fit on the virtual mesh; logging sinks; schedules."""

import json

import jax
import numpy as np
import optax
import pytest

from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.parallel.loader import ShardedDataLoader, spmd_fit
from notorch_tpu.parallel.mesh import make_mesh
from notorch_tpu.parallel.spmd import SpmdTrainer
from notorch_tpu.training.logging import CSVLogger, JSONLLogger, MultiLogger
from notorch_tpu.training.schedulers import noam_like_schedule
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol


@pytest.fixture(scope="module")
def small_ds(smis):
    rng = np.random.default_rng(0)
    sub = smis[:32]
    return MolecularDataset(
        {"smiles": sub, "y": rng.normal(size=len(sub))},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"])},
    )


@pytest.mark.multihost
def test_sharded_loader_spmd_training(small_ds):
    n_data, n_edge = 4, 2
    mesh = make_mesh({"data": n_data, "graph": n_edge})
    model = build_dmpnn(
        hidden_dim=32, depth=2, graph_axis="graph", optimizer=optax.adam(2e-3)
    )
    trainer = SpmdTrainer(model, mesh, data_axis="data", graph_axis="graph")

    loader = ShardedDataLoader(
        small_ds, n_data=n_data, per_shard_graphs=4, n_edge_shards=n_edge, shuffle=True
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    leaf = batches[0]["targets.y"]
    assert leaf.shape[:2] == (n_data, n_edge)

    state = trainer.init(jax.random.PRNGKey(0), batches[0])
    state, hist = spmd_fit(trainer, state, loader, epochs=4)
    assert hist[-1]["train/loss"] < hist[0]["train/loss"]
    assert np.isfinite(hist[-1]["train/loss"])


def test_loggers(tmp_path):
    jl = JSONLLogger(tmp_path / "log.jsonl")
    cl = CSVLogger(tmp_path / "log.csv")
    multi = MultiLogger(jl, cl)
    multi({"epoch": 0, "train/loss": 1.5})
    multi({"epoch": 1, "train/loss": 0.7, "val/rmse": 0.9})

    lines = (tmp_path / "log.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["train/loss"] == 0.7
    csv_text = (tmp_path / "log.csv").read_text().strip().split("\n")
    assert csv_text[0].startswith("epoch,train/loss")
    assert len(csv_text) == 3


def test_noam_schedule_shape():
    sched = noam_like_schedule(
        warmup_steps=10, cooldown_steps=100, init_lr=1e-4, max_lr=1e-3, final_lr=1e-4
    )
    assert abs(float(sched(0)) - 1e-4) < 1e-9
    assert abs(float(sched(10)) - 1e-3) < 1e-5
    mid = float(sched(60))
    assert 1e-4 < mid < 1e-3
    assert abs(float(sched(110)) - 1e-4) < 1e-6
    assert abs(float(sched(500)) - 1e-4) < 1e-9
    # monotone decay during cooldown
    vals = [float(sched(s)) for s in range(10, 111, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))

"""CGR reaction featurization + multicomponent model tests (the reference's
reaction overfit gate, test_regression_rxn.py, rebuilt)."""

import csv
import os

import jax
import numpy as np
import optax
import pytest

from notorch_tpu.data.batching import DataLoader
from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.models.multicomponent import build_multicomponent_dmpnn
from notorch_tpu.training.loop import fit
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol
from notorch_tpu.transforms.reaction import RxnMode, RxnToGraph

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def rxns():
    with open(os.path.join(DATA, "rxns.csv")) as f:
        return [row["rxn"] for row in csv.DictReader(f)]


@pytest.fixture(scope="module")
def multi_rows():
    with open(os.path.join(DATA, "multi.csv")) as f:
        return [(row["smiles1"], row["smiles2"]) for row in csv.DictReader(f)]


def test_cgr_featurization_modes(rxns):
    for mode in RxnMode:
        tf = RxnToGraph(mode=mode)
        g = tf(rxns[0])
        assert g.num_nodes > 0
        assert (g.node_types >= 0).all() and (g.node_types < tf.num_node_types).all()
        if g.num_edges:
            assert (g.edge_types >= 0).all() and (g.edge_types < tf.num_edge_types).all()
            assert (g.rev[g.rev] == np.arange(g.num_edges)).all()


def test_cgr_all_fixture_rxns(rxns):
    tf = RxnToGraph(mode=RxnMode.REAC_DIFF)
    for rxn in rxns:
        g = tf(rxn)
        assert g.num_nodes > 0


def test_cgr_bond_changes_are_marked(rxns):
    """A reaction that breaks a bond must produce edges whose product side
    differs from the reactant side."""
    tf = RxnToGraph(mode=RxnMode.REAC_PROD)
    # esterification-like: O-H bond broken; use first fixture rxn
    g = tf(rxns[0])
    half = g.edge_types.shape[1] // 2
    reac_side = g.edge_types[:, :half]
    prod_side = g.edge_types[:, half:] - (len(tf.bond_transform) + 1)
    assert (reac_side != prod_side).any()


def test_reaction_overfit(rxns):
    """Overfit gate for reactions (reference test_regression_rxn.py:73-100):
    memorize random targets on CGR graphs to MSE <= 0.01."""
    rng = np.random.default_rng(7)
    sub = rxns[:8]
    tf = RxnToGraph(mode=RxnMode.REAC_DIFF)
    ds = MolecularDataset(
        {"rxn": sub, "y": rng.normal(size=len(sub))},
        transforms={"graph": TransformManager(tf, in_key="rxn")},
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_dmpnn(
        hidden_dim=64,
        depth=2,
        num_node_types=tf.num_node_types,
        num_edge_types=tf.num_edge_types,
        optimizer=optax.adam(5e-3),
        layout="flat",
    )
    loader = DataLoader(ds, batch_size=8)
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=250)
    assert result.history[-1]["train/mse"] <= 0.01, result.history[-1]


def test_multicomponent_model(multi_rows):
    rng = np.random.default_rng(3)
    rows = multi_rows[:12]
    pipe1 = Pipeline(SmiToMol(), MolToGraph())
    pipe2 = Pipeline(SmiToMol(), MolToGraph())
    ds = MolecularDataset(
        {
            "smiles1": [r[0] for r in rows],
            "smiles2": [r[1] for r in rows],
            "y": rng.normal(size=len(rows)),
        },
        transforms={
            "g1": TransformManager(pipe1, in_key="smiles1", out_key="G1"),
            "g2": TransformManager(pipe2, in_key="smiles2", out_key="G2"),
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_multicomponent_dmpnn(
        ["inputs.G1", "inputs.G2"], hidden_dim=32, depth=2, optimizer=optax.adam(3e-3)
    )
    loader = DataLoader(ds, batch_size=12)
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=40)
    assert result.history[-1]["train/loss"] < result.history[0]["train/loss"]


def test_multicomponent_shared_encoder(multi_rows):
    rng = np.random.default_rng(3)
    rows = multi_rows[:6]
    ds = MolecularDataset(
        {
            "smiles1": [r[0] for r in rows],
            "smiles2": [r[1] for r in rows],
            "y": rng.normal(size=len(rows)),
        },
        transforms={
            "g1": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles1", out_key="G1"),
            "g2": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles2", out_key="G2"),
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_multicomponent_dmpnn(
        ["inputs.G1", "inputs.G2"], hidden_dim=16, depth=1, shared_encoder=True
    )
    loader = DataLoader(ds, batch_size=6)
    batch = next(iter(loader))
    state = model.init(jax.random.PRNGKey(0), batch)
    # shared encoder => embed_0 and embed_1 share parameters (same module)
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["train/loss"]))

def test_multicomponent_with_extra_features(multi_rows, rng, tmp_path):
    """Morgan-FP extra features concatenate into the fingerprint
    (reference MulticomponentMPNN.fingerprint X_f path)."""
    from notorch_tpu.transforms import MolToFP

    rows = multi_rows[:8]
    ds = MolecularDataset(
        {
            "smiles1": [r[0] for r in rows],
            "smiles2": [r[1] for r in rows],
            "y": rng.normal(size=len(rows)),
        },
        transforms={
            "g1": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles1", out_key="G1"),
            "g2": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles2", out_key="G2"),
            "fp": TransformManager(Pipeline(SmiToMol(), MolToFP(length=64)), in_key="smiles1", out_key="X_f"),
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_multicomponent_dmpnn(
        ["inputs.G1", "inputs.G2"],
        hidden_dim=16,
        depth=1,
        extra_features_key="inputs.X_f",
        extra_features_dim=64,
    )
    import jax as _jax

    loader = DataLoader(ds, batch_size=8)
    batch = next(iter(loader))
    state = model.init(_jax.random.PRNGKey(0), batch)
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["train/loss"]))


def test_multicomponent_cli_config(tmp_path):
    """The multicomponent preset runs through the CLI config path."""
    import pandas as pd

    from notorch_tpu.cli.train import apply_overrides, load_config, run

    rng2 = np.random.default_rng(0)
    with open(os.path.join(DATA, "multi.csv")) as f:
        import csv as _csv

        rows = [(r["smiles1"], r["smiles2"]) for r in _csv.DictReader(f)][:16]
    df = pd.DataFrame(
        {
            "smiles1": [r[0] for r in rows],
            "smiles2": [r[1] for r in rows],
            "y": rng2.normal(size=len(rows)),
        }
    )
    csv_path = tmp_path / "multi_y.csv"
    df.to_csv(csv_path, index=False)

    cfg = load_config("configs/multicomponent.yaml")
    apply_overrides(
        cfg,
        ["trainer.epochs=1", "trainer.batch_size=8", "model.hidden_dim=16", "model.depth=1"],
    )
    cfg["data"]["csv"] = str(csv_path)
    cfg["data"]["split"] = None
    out = run(cfg)
    assert np.isfinite(out["history"][-1]["train/loss"])

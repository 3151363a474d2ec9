"""layout="auto" selection: bin-packed blocks through the fused Pallas
kernel (dense_packed — the fastest measured path, VERDICT r2 #2/#3) are the
production default; constrained configs fall back to dense/flat. Every
documented aggregation resolves and runs under auto."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.models.dmpnn import AGGREGATIONS, build_dmpnn, resolve_layout


def test_resolve_layout_rules():
    # the unconstrained default is the bin-packed fused-kernel layout
    # (427.9M fwd / 181.0M fwd+bwd edge-layers/s measured vs 398.5M/146.7M
    # for per-molecule dense_fused — BASELINE.md round 2)
    assert resolve_layout("auto") == "dense_packed"
    # edge dropout -> jnp dense layout (kernel has no dropout)
    assert resolve_layout("auto", dropout=0.1) == "dense"
    # non-f32 state -> jnp dense layout (full-bf16 VMEM state measured slow)
    assert resolve_layout("auto", dtype=jnp.bfloat16) == "dense"
    # graph partitioning / remat / flat-specific impls -> flat
    assert resolve_layout("auto", graph_axis="graph") == "flat"
    assert resolve_layout("auto", remat=True) == "flat"
    assert resolve_layout("auto", impl="csr") == "flat"
    # explicit layouts pass through
    for explicit in ("flat", "dense", "dense_fused", "dense_packed"):
        assert resolve_layout(explicit, dropout=0.5, graph_axis="g") == explicit


@pytest.mark.parametrize("aggregation", sorted(AGGREGATIONS))
def test_resolve_layout_every_aggregation(aggregation):
    """No aggregation constrains the layout (all five exist in every
    layout); unknown names fail loudly at resolve time."""
    assert resolve_layout("auto", aggregation=aggregation) == "dense_packed"
    assert resolve_layout("auto", dropout=0.1, aggregation=aggregation) == "dense"


def test_resolve_layout_unknown_aggregation():
    with pytest.raises(ValueError, match="unknown aggregation"):
        resolve_layout("auto", aggregation="nope")


def test_build_dmpnn_default_uses_fused_block():
    from notorch_tpu.nn.chemprop_dense import FusedDenseChempropBlock

    model = build_dmpnn(hidden_dim=16, depth=1)
    assert isinstance(model.network.modules_["mp"], FusedDenseChempropBlock)


def test_build_dmpnn_dropout_falls_back_to_dense():
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock

    model = build_dmpnn(hidden_dim=16, depth=1, dropout=0.2)
    assert isinstance(model.network.modules_["mp"], DenseChempropBlock)


def test_build_dmpnn_fused_with_dropout_raises():
    with pytest.raises(ValueError, match="dropout"):
        build_dmpnn(hidden_dim=16, depth=1, dropout=0.2, layout="dense_fused")


def test_build_dmpnn_graph_axis_dense_raises():
    with pytest.raises(ValueError, match="flat layout"):
        build_dmpnn(hidden_dim=16, depth=1, graph_axis="graph", layout="dense")


def _packed_batch(smis, seed=0):
    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    n_bins = max(len(plan_bins(graphs, 72, 128)), 1)
    bg = pack_graphs_dense(graphs, 72, 128, bin_cap=n_bins)
    rng = np.random.default_rng(seed)
    y = rng.normal(size=(len(graphs), 1)).astype(np.float32)
    return {
        "inputs.G": bg,
        "targets.y": y,
        "targets.y_mask": np.ones_like(y, dtype=bool),
    }


@pytest.mark.parametrize("aggregation", sorted(AGGREGATIONS))
def test_auto_layout_trains_every_aggregation(aggregation, smis):
    """build_dmpnn(aggregation=...) under the auto default must build AND
    take a finite train step for all five readouts (the round-2 regression:
    gated crashed with KeyError, sdp was absent — VERDICT r2 weak #2)."""
    model = build_dmpnn(hidden_dim=16, depth=1, aggregation=aggregation)
    batch = _packed_batch(smis[:8])
    state = model.init(jax.random.PRNGKey(0), batch)
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["train/loss"]))


@pytest.mark.parametrize("aggregation", sorted(AGGREGATIONS))
def test_packed_model_consumes_per_molecule_batches(aggregation, smis):
    """The adaptive packed readouts fall back to the per-molecule dense form
    when the batch has no packing metadata — one auto model, both dense
    batch layouts."""
    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis[:8]]
    bg = pad_graphs_dense(graphs, 72, 128)
    y = np.random.default_rng(0).normal(size=(len(graphs), 1)).astype(np.float32)
    batch = {
        "inputs.G": bg,
        "targets.y": y,
        "targets.y_mask": np.ones_like(y, dtype=bool),
    }
    model = build_dmpnn(hidden_dim=16, depth=1, aggregation=aggregation)
    state = model.init(jax.random.PRNGKey(0), batch)
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["train/loss"]))


def test_cli_resolves_auto_layout_and_saves_it(tmp_path):
    """run() resolves layout=auto once, so the data pipeline, the model, and
    the saved predict_meta all agree."""
    import json

    import pandas as pd

    from notorch_tpu.cli.train import apply_overrides, load_config, run

    cfg = load_config("configs/dmpnn_regression.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=1",
            "trainer.batch_size=16",
            "model.hidden_dim=16",
            "model.depth=1",
            f"trainer.checkpoint_dir={tmp_path}/ckpt",
        ],
    )
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(48).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)

    out = run(cfg)
    assert np.isfinite(out["history"][-1]["train/loss"])
    meta = json.loads((tmp_path / "ckpt" / "predict_meta.json").read_text())
    assert meta["model"]["layout"] == "dense_packed"

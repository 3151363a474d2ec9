"""layout="auto" selection: the fused Pallas dense block is the production
default (VERDICT r1 #2); constrained configs fall back to dense/flat."""

import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.models.dmpnn import build_dmpnn, resolve_layout


def test_resolve_layout_rules():
    # the unconstrained default is the fused Pallas kernel
    assert resolve_layout("auto") == "dense_fused"
    # edge dropout -> jnp dense layout (kernel has no dropout)
    assert resolve_layout("auto", dropout=0.1) == "dense"
    # non-f32 state -> jnp dense layout (full-bf16 VMEM state measured slow)
    assert resolve_layout("auto", dtype=jnp.bfloat16) == "dense"
    # graph partitioning / remat / flat-specific impls -> flat
    assert resolve_layout("auto", graph_axis="graph") == "flat"
    assert resolve_layout("auto", remat=True) == "flat"
    assert resolve_layout("auto", impl="csr") == "flat"
    # explicit layouts pass through
    for explicit in ("flat", "dense", "dense_fused"):
        assert resolve_layout(explicit, dropout=0.5, graph_axis="g") == explicit


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
    assert meta["model"]["layout"] == "dense_fused"

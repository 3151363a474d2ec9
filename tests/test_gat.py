"""Graph-attention recipe (model.kind: gat) end to end: overfit gate,
config-driven training, and a long lipo accuracy sanity gate — the round-3
verdict's "attention as a first-class recipe". Reference spec:
``notorch/nn/gnn/attention.py:8,42`` (its NameError-broken version)."""

import jax
import numpy as np
import pytest

from notorch_tpu.data.batching import DataLoader, Subset, random_split
from notorch_tpu.models.gat import build_gat
from notorch_tpu.training.loop import evaluate, fit

from .test_training import _dataset


@pytest.fixture(scope="module")
def tiny(smis):
    rng = np.random.default_rng(42)
    smis = smis[:16]
    return _dataset(smis, rng.normal(size=len(smis)))


@pytest.mark.parametrize("attention", ["gatv2", "sdp"])
def test_gat_overfits_random_targets(tiny, attention):
    """Memorization gate, mirroring the D-MPNN one (reference
    test_regression.py:67-93): 16 random targets to MSE <= 1e-2."""
    import optax

    model = build_gat(
        hidden_dim=64, depth=2, attention=attention, optimizer=optax.adam(5e-3)
    )
    loader = DataLoader(tiny, batch_size=16, layout="flat")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=300)
    best = min(h["train/mse"] for h in result.history)
    assert best <= 1e-2, f"failed to overfit: best mse {best}"


def test_gat_trains_from_config(tmp_path):
    """configs/gat_regression.yaml trains through the CLI (config-only UX)."""
    import pandas as pd

    from notorch_tpu.cli.train import apply_overrides, load_config, run

    cfg = load_config("configs/gat_regression.yaml")
    apply_overrides(
        cfg,
        [
            "trainer.epochs=1",
            "trainer.batch_size=16",
            "trainer.prefetch=0",
            "model.hidden_dim=16",
            "model.depth=1",
            "model.num_heads=2",
        ],
    )
    small = tmp_path / "lipo_small.csv"
    pd.read_csv("tests/data/lipo.csv").head(48).to_csv(small, index=False)
    cfg["data"]["csv"] = str(small)
    out = run(cfg)
    assert np.isfinite(out["history"][-1]["train/loss"])
    assert np.isfinite(out["test"]["val/rmse"])


def test_graph_transformer_kind(tmp_path):
    """model.kind: graph_transformer resolves to the sdp attention stack."""
    from notorch_tpu.cli.train import build_model
    from notorch_tpu.nn.attention import GATBlock

    model = build_model(
        {"kind": "graph_transformer", "hidden_dim": 16, "depth": 1}, None, None
    )
    mp = model.network.modules_["mp"]
    assert isinstance(mp, GATBlock) and mp.attention == "sdp"


@pytest.mark.long
def test_gat_lipo_sanity(lipo_rows):
    """Accuracy sanity on real Lipophilicity: 15 epochs, random split, test
    RMSE <= 1.0 (the D-MPNN gate is 0.8; attention without bond-message
    recurrence is weaker on lipo — this pins 'trains to a sane accuracy',
    not architecture parity)."""
    import optax

    smis = [r[0] for r in lipo_rows]
    ys = [r[1] for r in lipo_rows]
    ds = _dataset(smis, ys)
    train_idx, _, test_idx = random_split(len(ds), (0.8, 0.1, 0.1), seed=0)
    train, test = Subset(ds, train_idx), Subset(ds, test_idx)
    transforms = train.build_task_transform_configs()
    transforms["y"]["preds"]["key"] = "ffn.preds"
    model = build_gat(
        hidden_dim=128, depth=3, transforms=transforms, optimizer=optax.adam(1e-3)
    )
    train_loader = DataLoader(train, batch_size=64, shuffle=True, seed=0)
    state = model.init(jax.random.PRNGKey(0), next(iter(train_loader)))
    result = fit(model, state, train_loader, epochs=15)
    logs = evaluate(model, result.state.params, DataLoader(test, batch_size=64))
    std = transforms["y"]["targets"]["module"].scale[0]
    rmse = logs["val/rmse"] * std
    assert rmse <= 1.0, f"GAT lipo RMSE {rmse:.3f} > 1.0"

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
        hidden_dim=64, depth=2, attention=attention, optimizer=optax.adam(5e-3),
        layout="flat",  # the sdp auto default is dense_packed, tested below
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
    """model.kind: graph_transformer resolves to the sdp attention stack —
    on the DENSE-PACKED layout by default (the layer is batched MXU matmuls
    there — measured 11.2x fwd / 8.3x train over the flat segment form)."""
    from notorch_tpu.cli.train import build_model
    from notorch_tpu.nn.attention import GATBlock
    from notorch_tpu.nn.attention_dense import DenseGATBlock

    model = build_model(
        {"kind": "graph_transformer", "hidden_dim": 16, "depth": 1}, None, None
    )
    assert isinstance(model.network.modules_["mp"], DenseGATBlock)
    # flat stays available explicitly
    model = build_model(
        {"kind": "graph_transformer", "hidden_dim": 16, "depth": 1, "layout": "flat"},
        None, None,
    )
    mp = model.network.modules_["mp"]
    assert isinstance(mp, GATBlock) and mp.attention == "sdp"
    # GATv2 goes dense too now (round 5: edge-space scores + scatter)
    from notorch_tpu.nn.attention_dense import DenseGATBlock as _DGB

    m = build_gat(hidden_dim=16, depth=1, attention="gatv2", layout="dense_packed")
    mp = m.network.modules_["mp"]
    assert isinstance(mp, _DGB) and mp.attention == "gatv2"


def test_dense_attention_matches_flat():
    """DenseGraphSelfAttention == flat GraphSelfAttention with the SAME
    parameters, per real node, on per-molecule AND packed bins."""
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.nn.attention import GraphSelfAttention
    from notorch_tpu.nn.attention_dense import DenseGraphSelfAttention
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in ["CCO", "c1ccccc1C(=O)O", "CC(C)CC(N)C(=O)O", "O"]]
    d = 16
    key = jax.random.PRNGKey(0)

    bg = pad_graphs(graphs, 64, 128, graph_cap=len(graphs))
    embed = GraphEmbedding(hidden_dim=d)
    ev = embed.init(key, bg)
    G1 = embed.apply(ev, bg)
    flat = GraphSelfAttention(hidden_dim=d, num_heads=2)
    av = flat.init(key, G1)
    out_flat = flat.apply(av, G1).node_feats

    dembed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    dense = DenseGraphSelfAttention(hidden_dim=d, num_heads=2)
    for bgd in (
        pad_graphs_dense(graphs, 32, 64),
        pack_graphs_dense(graphs, 32, 64, bin_cap=len(plan_bins(graphs, 32, 64))),
    ):
        G2 = dembed.apply(ev, bgd)
        out_dense = dense.apply(av, G2).node_feats  # SAME params
        nf = np.asarray(out_flat)
        nd = np.asarray(out_dense)
        ng_flat = np.asarray(bg.node_graph)
        if bgd.node_graph is not None:
            ng_d = np.asarray(bgd.node_graph)
            for i in range(len(graphs)):
                np.testing.assert_allclose(
                    nd[ng_d == i], nf[ng_flat == i], rtol=1e-4, atol=1e-5
                )
        else:
            for i, g in enumerate(graphs):
                np.testing.assert_allclose(
                    nd[i][: g.num_nodes], nf[ng_flat == i], rtol=1e-4, atol=1e-5
                )


def test_dense_transformer_overfits(tiny):
    """Memorization gate for the dense-packed graph-transformer path."""
    import optax

    model = build_gat(
        hidden_dim=64, depth=2, attention="sdp", optimizer=optax.adam(5e-3)
    )
    loader = DataLoader(tiny, batch_size=16, layout="dense_packed")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=300)
    best = min(h["train/mse"] for h in result.history)
    assert best <= 1e-2, f"failed to overfit: best mse {best}"


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
    # auto layout resolves dense_packed (round 5) — use the production
    # loader settings (gat_loader_kwargs: lane-aligned 128x256 bins)
    from notorch_tpu.models.gat import gat_loader_kwargs

    lk = gat_loader_kwargs("dense_packed")
    train_loader = DataLoader(
        train, batch_size=64, shuffle=True, seed=0, layout="dense_packed", **lk
    )
    state = model.init(jax.random.PRNGKey(0), next(iter(train_loader)))
    result = fit(model, state, train_loader, epochs=15)
    logs = evaluate(
        model, result.state.params,
        DataLoader(test, batch_size=64, layout="dense_packed", **lk),
    )
    std = transforms["y"]["targets"]["module"].scale[0]
    rmse = logs["val/rmse"] * std
    assert rmse <= 1.0, f"GAT lipo RMSE {rmse:.3f} > 1.0"


def test_dense_gatv2_matches_flat():
    """DenseGATv2Layer == flat GATv2Layer with the SAME parameters per real
    node (round-5: the LeakyReLU score computed in EDGE space then
    scattered — the 'non-factorizable' wall was about q.k^T form, not about
    the dense layout)."""
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.nn.attention import GATv2Layer
    from notorch_tpu.nn.attention_dense import DenseGATv2Layer
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in ["CCO", "c1ccccc1C(=O)O", "CC(C)CC(N)C(=O)O", "O"]]
    d = 16
    key = jax.random.PRNGKey(0)

    bg = pad_graphs(graphs, 64, 128, graph_cap=len(graphs))
    embed = GraphEmbedding(hidden_dim=d)
    ev = embed.init(key, bg)
    G1 = embed.apply(ev, bg)
    flat = GATv2Layer(hidden_dim=d, num_heads=2)
    av = flat.init(key, G1)
    out_flat = np.asarray(flat.apply(av, G1).node_feats)

    dembed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    dense = DenseGATv2Layer(hidden_dim=d, num_heads=2)
    ng_flat = np.asarray(bg.node_graph)
    for bgd in (
        pad_graphs_dense(graphs, 32, 64),
        pack_graphs_dense(graphs, 32, 64, bin_cap=len(plan_bins(graphs, 32, 64))),
    ):
        G2 = dembed.apply(ev, bgd)
        nd = np.asarray(dense.apply(av, G2).node_feats)  # SAME params
        if bgd.node_graph is not None:
            ng_d = np.asarray(bgd.node_graph)
            for i in range(len(graphs)):
                np.testing.assert_allclose(
                    nd[ng_d == i], out_flat[ng_flat == i], rtol=1e-4, atol=1e-5
                )
        else:
            for i, g in enumerate(graphs):
                np.testing.assert_allclose(
                    nd[i][: g.num_nodes], out_flat[ng_flat == i], rtol=1e-4, atol=1e-5
                )


def test_dense_gatv2_block_overfits(tiny):
    """DenseGATBlock(attention='gatv2') memorizes a tiny set (the full
    dense-GATv2 stack trains end to end)."""
    import optax

    from notorch_tpu.nn.attention_dense import DenseGATBlock
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding  # noqa: F401

    model = build_gat(
        hidden_dim=64, depth=2, attention="gatv2", layout="dense_packed",
        optimizer=optax.adam(5e-3),
    )
    loader = DataLoader(tiny, batch_size=16, layout="dense_packed")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=300)
    best = min(h["train/mse"] for h in result.history)
    assert best <= 1e-2, f"failed to overfit: best mse {best}"

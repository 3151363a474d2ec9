"""MoE routing + graph attention tests."""

import jax
import jax.numpy as jnp
import numpy as np

from notorch_tpu.data.graph import pad_graphs
from notorch_tpu.nn.attention import GATv2Layer, GraphSelfAttention
from notorch_tpu.nn.embed import GraphEmbedding
from notorch_tpu.nn.mlp import MLP
from notorch_tpu.nn.moe import (
    DenseRouter,
    MixtureOfExperts,
    SparseRouter,
    keep_top_k,
    kth_excluding,
)
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())


def test_keep_top_k():
    x = jnp.asarray([[3.0, 1.0, 2.0, 0.0]])
    out = np.asarray(keep_top_k(x, 2))
    assert np.isfinite(out[0, [0, 2]]).all()
    assert np.isneginf(out[0, [1, 3]]).all()


def test_kth_excluding():
    H = jnp.asarray([[5.0, 3.0, 1.0]])
    out = np.asarray(kth_excluding(H, 1))
    # excluding col0 (5): max is 3; excluding col1: max is 5; excluding col2: 5
    np.testing.assert_allclose(out, [[3.0, 5.0, 5.0]])


def test_dense_router():
    r = DenseRouter(num_experts=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 8)).astype(np.float32))
    params = r.init(jax.random.PRNGKey(0), x)
    w, aux = r.apply(params, x)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert float(aux) >= 0


def test_sparse_router_topk():
    r = SparseRouter(num_experts=6, k=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 8)).astype(np.float32))
    params = r.init(jax.random.PRNGKey(0), x)
    w, aux = r.apply(params, x)  # eval mode: no noise
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    assert ((w > 0).sum(-1) <= 2).all()  # at most k experts active
    assert np.isfinite(float(aux))


def test_moe_forward_and_grad():
    moe = MixtureOfExperts(
        expert_fn=lambda: MLP(input_dim=8, output_size=8, hidden_dim=16),
        num_experts=3,
        router_kind="dense",
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32))
    params = moe.init(jax.random.PRNGKey(0), x)
    out, aux = moe.apply(params, x)
    assert out.shape == (5, 8)
    # experts are distinct (stacked params axis)
    kernel = params["params"]["experts"]["dense_0"]["kernel"]
    assert kernel.shape[0] == 3
    assert not np.allclose(np.asarray(kernel[0]), np.asarray(kernel[1]))

    def loss(p):
        o, a = moe.apply(p, x)
        return (o**2).mean() + a

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)


def _graph_batch():
    graphs = [PIPE(s) for s in ["CCO", "c1ccccc1C(=O)N"]]
    return pad_graphs(graphs, 32, 64, graph_cap=2)


def test_gatv2_and_self_attention():
    bg = _graph_batch()
    embed = GraphEmbedding(hidden_dim=32)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, bg)
    G = embed.apply(ev, bg)

    for layer in [GATv2Layer(hidden_dim=32, num_heads=4), GraphSelfAttention(32, 4)]:
        lv = layer.init(key, G)
        out = layer.apply(lv, G)
        feats = np.asarray(out.node_feats)
        assert feats.shape == (32, 32)
        assert np.isfinite(feats).all()
        # isolated padding nodes receive nothing
        pad_rows = feats[~np.asarray(bg.node_mask)]
        if len(pad_rows):
            # GATv2 output for nodes with no incoming edges is zero pre-bias
            assert np.abs(pad_rows).max() < 10.0

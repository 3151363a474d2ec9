"""NN layer tests: segment ops, D-MPNN parity vs the numpy oracle, readouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.graph import pad_graphs
from notorch_tpu.nn import ops
from notorch_tpu.nn.agg import Gated, Max, Mean, Sum
from notorch_tpu.nn.chemprop import ChempropBlock
from notorch_tpu.nn.embed import GraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

from .oracle import chemprop_block, embedding_bag_sum

PIPE = Pipeline(SmiToMol(), MolToGraph())


def _batch(smis, v_cap=64, e_cap=128, g_cap=None):
    graphs = [PIPE(s) for s in smis]
    return pad_graphs(graphs, v_cap, e_cap, graph_cap=g_cap), graphs


def test_segment_ops_match_numpy(rng):
    data = rng.normal(size=(50, 8)).astype(np.float32)
    ids = rng.integers(0, 7, size=50)
    for reduce, npfn in [("sum", np.add.reduceat)]:
        out = ops.segment_sum(jnp.asarray(data), jnp.asarray(ids), 7)
        expect = np.zeros((7, 8), np.float32)
        np.add.at(expect, ids, data)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    mean = ops.segment_mean(jnp.asarray(data), jnp.asarray(ids), 7)
    counts = np.bincount(ids, minlength=7)[:, None]
    np.testing.assert_allclose(mean, expect / np.maximum(counts, 1), rtol=1e-5)

    mx = ops.segment_max(jnp.asarray(data), jnp.asarray(ids), 8)  # segment 7 empty
    assert np.isfinite(np.asarray(mx)).all()


def test_segment_softmax_masked(rng):
    scores = jnp.asarray(rng.normal(size=12).astype(np.float32))
    ids = jnp.asarray(np.repeat(np.arange(3), 4))
    mask = jnp.asarray(np.array([True] * 10 + [False] * 2))
    alpha = ops.segment_softmax(scores, ids, 3, mask=mask)
    alpha = np.asarray(alpha)
    np.testing.assert_allclose(
        [alpha[:4].sum(), alpha[4:8].sum(), alpha[8:].sum()], [1, 1, 1], rtol=1e-5
    )
    assert (alpha[10:] == 0).all()


def test_chemprop_matches_oracle(rng):
    """Per-layer hidden-state parity: flax/XLA vs the pinned numpy oracle."""
    bg, graphs = _batch(["CCO", "c1ccccc1C(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O"])
    d = 32

    embed = GraphEmbedding(hidden_dim=d)
    block = ChempropBlock(hidden_dim=d, depth=3, residual=True)

    key = jax.random.PRNGKey(0)
    ev = embed.init(key, bg)
    G = embed.apply(ev, bg)
    bv = block.init(key, G)
    out = block.apply(bv, G)

    # numpy oracle with the same weights
    node_table = np.asarray(ev["params"]["node"]["embedding"]["embedding"])
    edge_table = np.asarray(ev["params"]["edge"]["embedding"]["embedding"])
    node_feats = embedding_bag_sum(node_table, np.asarray(bg.node_feats))
    edge_feats = embedding_bag_sum(edge_table, np.asarray(bg.edge_feats))
    np.testing.assert_allclose(np.asarray(G.node_feats), node_feats, rtol=1e-5, atol=1e-5)

    Ws = [np.asarray(bv["params"][f"layer_{i}"]["update"]["kernel"]) for i in range(3)]
    bs = [np.asarray(bv["params"][f"layer_{i}"]["update"]["bias"]) for i in range(3)]
    node_h, edge_h, _ = chemprop_block(
        node_feats,
        edge_feats,
        np.asarray(bg.src),
        np.asarray(bg.dst),
        np.asarray(bg.rev),
        Ws,
        bs,
        residual=True,
    )
    mask = np.asarray(bg.node_mask)
    np.testing.assert_allclose(
        np.asarray(out.node_feats)[mask], node_h[mask], rtol=1e-4, atol=1e-4
    )
    emask = np.asarray(bg.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out.edge_feats)[emask], edge_h[emask], rtol=1e-4, atol=1e-4
    )


def test_chemprop_batch_independence():
    """Batching must not change a molecule's hiddens (disjoint union)."""
    d = 16
    embed = GraphEmbedding(hidden_dim=d)
    block = ChempropBlock(hidden_dim=d, depth=2)
    key = jax.random.PRNGKey(1)

    bg_single, _ = _batch(["c1ccccc1C(=O)O"], v_cap=32, e_cap=64)
    bg_multi, _ = _batch(["CCO", "c1ccccc1C(=O)O"], v_cap=32, e_cap=64)

    ev = embed.init(key, bg_single)
    bv = block.init(key, embed.apply(ev, bg_single))

    out_single = block.apply(bv, embed.apply(ev, bg_single))
    out_multi = block.apply(bv, embed.apply(ev, bg_multi))

    # molecule 2 occupies nodes [3:12] of the multi batch
    single = np.asarray(out_single.node_feats)[np.asarray(bg_single.node_mask)]
    multi_mask = np.asarray(bg_multi.node_graph) == 1
    multi = np.asarray(out_multi.node_feats)[multi_mask]
    np.testing.assert_allclose(single, multi, rtol=1e-5, atol=1e-5)


def test_aggregations(rng):
    bg, graphs = _batch(["CCO", "c1ccccc1"], v_cap=32, e_cap=32, g_cap=3)
    d = 8
    feats = jnp.asarray(rng.normal(size=(32, d)).astype(np.float32))
    G = bg.update(node_feats=feats)
    key = jax.random.PRNGKey(0)

    out_sum = Sum().apply(Sum().init(key, G), G)
    assert out_sum.shape == (3, d)
    node_graph = np.asarray(bg.node_graph)
    for i, g in enumerate(graphs):
        np.testing.assert_allclose(
            np.asarray(out_sum)[i], np.asarray(feats)[node_graph == i].sum(0), rtol=1e-5
        )
    # padding graph slot is zero
    np.testing.assert_allclose(np.asarray(out_sum)[2], 0.0, atol=1e-6)

    out_mean = Mean().apply(Mean().init(key, G), G)
    for i, g in enumerate(graphs):
        np.testing.assert_allclose(
            np.asarray(out_mean)[i], np.asarray(feats)[node_graph == i].mean(0), rtol=1e-5
        )

    out_max = Max().apply(Max().init(key, G), G)
    for i, g in enumerate(graphs):
        np.testing.assert_allclose(
            np.asarray(out_max)[i], np.asarray(feats)[node_graph == i].max(0), rtol=1e-5
        )

    gated = Gated(input_dim=d)
    gv = gated.init(key, G)
    out_gated = gated.apply(gv, G)
    assert out_gated.shape == (3, d)
    assert np.isfinite(np.asarray(out_gated)).all()


def test_chemprop_block_remat_matches_exact():
    """remat=True (jax.checkpoint per layer) changes memory, not math: loss
    and grads bit-match the non-remat block."""
    import jax

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    pipe = Pipeline(SmiToMol(), MolToGraph())
    bg = pad_graphs([pipe("CCO"), pipe("c1ccccc1C(=O)O")], 32, 64, graph_cap=2)
    rng = np.random.default_rng(0)
    d = 16
    bg = bg.update(
        node_feats=jnp.asarray(rng.normal(size=(bg.num_nodes, d)).astype(np.float32)),
        edge_feats=jnp.asarray(rng.normal(size=(bg.num_edges, d)).astype(np.float32)),
    )

    base = ChempropBlock(hidden_dim=d, depth=3)
    rem = ChempropBlock(hidden_dim=d, depth=3, remat=True)
    params = base.init(jax.random.PRNGKey(0), bg)

    def loss(module):
        def f(p):
            out = module.apply(p, bg)
            return (out.node_feats**2).mean()
        return f

    l0, g0 = jax.value_and_grad(loss(base))(params)
    l1, g1 = jax.value_and_grad(loss(rem))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

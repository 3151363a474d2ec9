"""Dense per-molecule layout: parity with the flat sparse path."""

import jax
import jax.numpy as jnp
import numpy as np

from notorch_tpu.data.dense import pad_graphs_dense, rev_pair_swap
from notorch_tpu.data.graph import pad_graphs
from notorch_tpu.nn.chemprop import ChempropBlock
from notorch_tpu.nn.chemprop_dense import (
    DenseChempropBlock,
    DenseGraphEmbedding,
    DenseMean,
    DenseSum,
)
from notorch_tpu.nn.embed import GraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())
SMIS = ["CCO", "c1ccccc1C(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "O"]


def test_rev_pair_swap():
    x = jnp.arange(2 * 6 * 3).reshape(2, 6, 3)
    y = rev_pair_swap(x)
    np.testing.assert_array_equal(np.asarray(y[:, 0]), np.asarray(x[:, 1]))
    np.testing.assert_array_equal(np.asarray(y[:, 5]), np.asarray(x[:, 4]))


def test_dense_matches_sparse():
    """Same molecules, same weights: dense-blocked hiddens == flat hiddens."""
    graphs = [PIPE(s) for s in SMIS]
    d = 32
    key = jax.random.PRNGKey(0)

    # sparse/flat path
    bg = pad_graphs(graphs, 64, 128, graph_cap=len(graphs))
    embed = GraphEmbedding(hidden_dim=d)
    block = ChempropBlock(hidden_dim=d, depth=3)
    ev = embed.init(key, bg)
    G1 = embed.apply(ev, bg)
    bv = block.init(key, G1)
    out_flat = block.apply(bv, G1)

    # dense path with the SAME parameters (module trees share names)
    dbg = pad_graphs_dense(graphs, nodes_per_graph=32, edges_per_graph=64)
    dembed = DenseGraphEmbedding(num_node_types=42, num_edge_types=13, hidden_dim=d)
    dblock = DenseChempropBlock(hidden_dim=d, depth=3)
    G2 = dembed.apply(ev, dbg)
    out_dense = dblock.apply(bv, G2)

    node_flat = np.asarray(out_flat.node_feats)
    node_dense = np.asarray(out_dense.node_feats)
    for i, g in enumerate(graphs):
        flat_rows = node_flat[np.asarray(bg.node_graph) == i]
        dense_rows = node_dense[i][: g.num_nodes]
        np.testing.assert_allclose(flat_rows, dense_rows, rtol=1e-4, atol=1e-4)

    edge_flat = np.asarray(out_flat.edge_feats)[np.asarray(bg.edge_mask)]
    edge_dense = np.concatenate(
        [np.asarray(out_dense.edge_feats)[i][: g.num_edges] for i, g in enumerate(graphs)]
    )
    np.testing.assert_allclose(edge_flat, edge_dense, rtol=1e-4, atol=1e-4)


def test_dense_readouts():
    graphs = [PIPE(s) for s in SMIS[:2]]
    dbg = pad_graphs_dense(graphs, 16, 32, graph_cap=3)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(3, 16, 8)).astype(np.float32))
    G = dbg.update(node_feats=feats)
    key = jax.random.PRNGKey(0)

    s = DenseSum().apply(DenseSum().init(key, G), G)
    m = DenseMean().apply(DenseMean().init(key, G), G)
    mask = np.asarray(dbg.node_mask)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(s)[i], np.asarray(feats)[i][mask[i]].sum(0), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m)[i], np.asarray(feats)[i][mask[i]].mean(0), rtol=1e-5
        )
    # empty (padding) graph slot -> zeros
    np.testing.assert_allclose(np.asarray(s)[2], 0.0, atol=1e-6)


def _float_feature_batches(smis, d=8, seed=0):
    """Same random per-node float features laid out flat, dense, and packed."""
    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins

    graphs = [PIPE(s) for s in smis]
    rng = np.random.default_rng(seed)
    per_mol = [rng.normal(size=(g.num_nodes, d)).astype(np.float32) for g in graphs]

    bg = pad_graphs(graphs, 64, 128, graph_cap=len(graphs))
    flat_feats = np.zeros((bg.num_nodes, d), np.float32)
    node_graph = np.asarray(bg.node_graph)
    for i, f in enumerate(per_mol):
        flat_feats[node_graph == i] = f
    bg = bg.update(node_feats=jnp.asarray(flat_feats))

    dbg = pad_graphs_dense(graphs, 32, 64)
    dense_feats = np.zeros((len(graphs), 32, d), np.float32)
    for i, f in enumerate(per_mol):
        dense_feats[i, : len(f)] = f
    dbg = dbg.update(node_feats=jnp.asarray(dense_feats))

    n_bins = len(plan_bins(graphs, 32, 64))
    pbg = pack_graphs_dense(graphs, 32, 64, bin_cap=n_bins)
    pk_feats = np.zeros((n_bins, 32, d), np.float32)
    ng = np.asarray(pbg.node_graph)
    for i, f in enumerate(per_mol):
        pk_feats[ng == i] = f
    pbg = pbg.update(node_feats=jnp.asarray(pk_feats))
    return graphs, bg, dbg, pbg


def test_gated_readout_parity_flat_dense_packed():
    """Gated pooling: the dense and packed forms equal the flat module on the
    same features with the SAME parameters (shared `a` tree)."""
    from notorch_tpu.nn.agg import Gated
    from notorch_tpu.nn.chemprop_dense import DenseGated, PackedGated

    graphs, bg, dbg, pbg = _float_feature_batches(SMIS)
    key = jax.random.PRNGKey(1)
    flat = Gated(input_dim=8)
    params = flat.init(key, bg)
    ref = np.asarray(flat.apply(params, bg))

    out_dense = np.asarray(DenseGated().apply(params, dbg))
    out_packed = np.asarray(PackedGated().apply(params, pbg))
    np.testing.assert_allclose(out_dense, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_packed, ref, rtol=1e-5, atol=1e-6)
    # dense fallback of the packed module (no packing metadata)
    out_fb = np.asarray(PackedGated().apply(params, dbg))
    np.testing.assert_allclose(out_fb, ref, rtol=1e-5, atol=1e-6)


def test_sdp_readout_parity_flat_dense_packed():
    """SDP pooling with an explicit per-graph query: dense/packed == flat."""
    from notorch_tpu.nn.agg import SDPAttention
    from notorch_tpu.nn.chemprop_dense import DenseSDPAttention, PackedSDPAttention

    graphs, bg, dbg, pbg = _float_feature_batches(SMIS)
    rng = np.random.default_rng(3)
    Q = jnp.asarray(rng.normal(size=(len(graphs), 8)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    flat = SDPAttention(key_dim=8)
    params = flat.init(key, bg, Q)
    ref = np.asarray(flat.apply(params, bg, Q))
    out_dense = np.asarray(DenseSDPAttention(key_dim=8).apply(params, dbg, Q))
    out_packed = np.asarray(PackedSDPAttention(key_dim=8).apply(params, pbg, Q))
    np.testing.assert_allclose(out_dense, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_packed, ref, rtol=1e-5, atol=1e-6)


def test_sdp_learned_query_parity():
    """Factory path (no Q wired): the learned broadcast query gives the same
    pooling across layouts when parameters are shared."""
    from notorch_tpu.nn.agg import SDPAttention
    from notorch_tpu.nn.chemprop_dense import DenseSDPAttention, PackedSDPAttention

    graphs, bg, dbg, pbg = _float_feature_batches(SMIS)
    key = jax.random.PRNGKey(2)
    flat = SDPAttention(key_dim=8)
    params = flat.init(key, bg)
    assert "query" in params["params"]
    ref = np.asarray(flat.apply(params, bg))
    out_dense = np.asarray(DenseSDPAttention(key_dim=8).apply(params, dbg))
    out_packed = np.asarray(PackedSDPAttention(key_dim=8).apply(params, pbg))
    np.testing.assert_allclose(out_dense, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_packed, ref, rtol=1e-5, atol=1e-6)


def test_packed_multi_shard_readout_guard():
    """ADVICE r2: a shards>1 packed batch (chunk-local molecule ids) must be
    rejected by per-molecule readouts outside a sharded trainer."""
    import pytest

    from notorch_tpu.data.dense import pack_graphs_dense
    from notorch_tpu.nn.chemprop_dense import PackedSum

    graphs = [PIPE(s) for s in SMIS]
    pbg = pack_graphs_dense(graphs, 32, 64, n_shards=2, bin_cap=4)
    feats = jnp.zeros((4, 32, 8), jnp.float32)
    pbg = pbg.update(node_feats=feats)
    mod = PackedSum()
    with pytest.raises(ValueError, match="chunk-local"):
        mod.apply({"params": {}}, pbg)


def test_pack_rejects_odd_edge_molecule():
    """ADVICE r2: an odd directed-edge list would shift the reverse-pair
    alignment of every molecule packed after it — refuse it loudly."""
    import pytest

    from notorch_tpu.data.dense import pack_graphs_dense
    from notorch_tpu.data.graph import Graph

    bad = Graph(
        node_types=np.zeros((2, 1), np.int32),
        edge_types=np.zeros((1, 1), np.int32),
        src=np.asarray([0], np.int32),
        dst=np.asarray([1], np.int32),
        rev=np.asarray([0], np.int32),
    )
    with pytest.raises(ValueError, match="odd edge count"):
        pack_graphs_dense([bad], 8, 8)

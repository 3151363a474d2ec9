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

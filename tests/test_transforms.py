"""Featurization and padding/batching tests."""

import numpy as np

from notorch_tpu.chem import parse_smiles
from notorch_tpu.data.graph import bucket_caps, pad_graphs
from notorch_tpu.transforms import (
    MolToFP,
    MolToGraph,
    MultiTypeAtomTransform,
    MultiTypeBondTransform,
    Pipeline,
    SmiToMol,
)
from notorch_tpu.transforms.vocab import DEFAULT_NUM_ATOM_TYPES, DEFAULT_NUM_BOND_TYPES


def test_vocab_sizes():
    assert DEFAULT_NUM_ATOM_TYPES == 42
    assert DEFAULT_NUM_BOND_TYPES == 13
    assert len(MultiTypeAtomTransform()) == 42
    assert len(MultiTypeBondTransform()) == 13


def test_atom_type_offsets_disjoint():
    tf = MultiTypeAtomTransform()
    mol = parse_smiles("Cn1c(CN2CCN(CC2)c3ccc(Cl)cc3)nc4ccccc14")
    ids = tf(mol.GetAtoms())
    assert ids.shape == (mol.GetNumAtoms(), tf.num_types)
    # each family's ids stay inside its offset range
    lo = tf.offset
    hi = np.append(tf.offset[1:], len(tf))
    assert (ids >= lo[None, :]).all() and (ids < hi[None, :]).all()


def test_mol_to_graph_rev_index():
    g = Pipeline(SmiToMol(), MolToGraph())("c1ccccc1CC(=O)N")
    # rev is an involution mapping each directed edge to its reverse
    assert (g.rev[g.rev] == np.arange(g.num_edges)).all()
    assert (g.src[g.rev] == g.dst).all()
    assert (g.dst[g.rev] == g.src).all()
    # interleaved pairs
    assert (g.rev == np.arange(g.num_edges).reshape(-1, 2)[:, ::-1].ravel()).all()


def test_pad_graphs_invariants():
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1"]]
    v_cap, e_cap = bucket_caps(
        sum(g.num_nodes for g in graphs), sum(g.num_edges for g in graphs), (64,), (128,)
    )
    bg = pad_graphs(graphs, v_cap, e_cap, graph_cap=4, np_out=True)

    assert bg.node_feats.shape[0] == v_cap and bg.edge_feats.shape[0] == e_cap
    assert bg.n_graphs == 4
    assert int(bg.num_graphs_real) == 3
    total_v = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    assert bg.node_mask.sum() == total_v and bg.edge_mask.sum() == total_e
    # padding edges point at the sink node and at themselves
    pad_e = ~bg.edge_mask
    assert (bg.src[pad_e] == v_cap - 1).all() and (bg.dst[pad_e] == v_cap - 1).all()
    assert (bg.rev[pad_e] == np.arange(e_cap)[pad_e]).all()
    # padding segment ids point at the trash slot
    assert (bg.node_graph[~bg.node_mask] == 4).all()
    assert (bg.edge_graph[pad_e] == 4).all()
    # real edges never reference padding nodes
    real_e = bg.edge_mask
    assert bg.node_mask[bg.src[real_e]].all() and bg.node_mask[bg.dst[real_e]].all()
    # rev still an involution globally
    assert (bg.rev[bg.rev] == np.arange(e_cap)).all()


def test_graph_utilities():
    g = Pipeline(SmiToMol(), MolToGraph())("C1CC1")
    A = g.dense_adjacency()
    assert A.sum() == g.num_edges
    assert (A == A.T).all()
    d2s = g.dense2sparse()
    assert (d2s[g.src, g.dst] == np.arange(g.num_edges)).all()
    nodes, edges = g.random_walk(length=4, num_walks=2, rng=np.random.default_rng(0))
    assert nodes.shape == (3, 2, 5)
    assert edges.shape == (3, 2, 4)
    assert (edges >= 0).all()  # every traversed step exists as an edge


def test_fingerprint_collate():
    pipe = Pipeline(SmiToMol(), MolToFP(length=512))
    fps = pipe.collate([pipe(s) for s in ["CCO", "CCN"]])
    assert fps.shape == (2, 512) and fps.dtype == np.float32

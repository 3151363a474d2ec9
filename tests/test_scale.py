"""Scale/stress tests: large ragged batches, bucketing behavior, big
molecules (the QM9/PCQM4Mv2-prep axis of SURVEY §7 phase 3/5)."""

import numpy as np
import pytest

from notorch_tpu.data.batching import DataLoader, bucket_ladder, round_up_ladder
from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol


def _synthetic_smiles(n, rng):
    """Valid random SMILES from 4 to ~400 atoms: chains with branches,
    rings, and heteroatoms."""
    out = []
    atoms = ["C", "C", "C", "N", "O", "S"]
    for _ in range(n):
        length = int(rng.integers(3, 120))
        parts = []
        for i in range(length):
            parts.append(atoms[rng.integers(0, len(atoms))])
            if rng.random() < 0.15:
                parts.append("(C)")
            if rng.random() < 0.1:
                parts.append("c1ccccc1")
        out.append("".join(parts))
    return out


def test_bucket_ladder_bounds():
    ladder = bucket_ladder(128, 1 << 20)
    # geometric: at most ~4 entries per octave
    assert len(ladder) < 50
    for v in [1, 100, 129, 1000, 5000, 100000]:
        b = round_up_ladder(v, ladder)
        assert b >= v
        assert b <= 2 * v + 256  # bounded waste


@pytest.mark.parametrize("layout", ["flat", "dense"])
def test_large_ragged_batches(layout, rng):
    smis = _synthetic_smiles(300, rng)
    ds = MolecularDataset(
        {"smiles": smis, "y": rng.normal(size=len(smis))},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0, layout=layout)
    shapes = set()
    n_mols = 0
    for batch in loader:
        G = batch["inputs.G"]
        if layout == "flat":
            shapes.add((G.num_nodes, G.num_edges))
            n_mols += int(G.num_graphs_real)
            # all real edges reference real nodes
            em = np.asarray(G.edge_mask)
            assert np.asarray(G.node_mask)[np.asarray(G.src)[em]].all()
        else:
            shapes.add((G.nodes_per_graph, G.edges_per_graph))
            n_mols += int(np.asarray(G.graph_mask).sum())
    assert n_mols == len(smis)
    # bounded compile count despite 300 random sizes
    assert len(shapes) <= 6, shapes


def test_huge_molecule_roundtrip(rng):
    """A ~400-atom molecule survives featurize->pad->message passing."""
    import jax

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.embed import GraphEmbedding

    smi = "".join(["C(C)" if i % 7 == 0 else "C" for i in range(200)])
    pipe = Pipeline(SmiToMol(), MolToGraph())
    g = pipe(smi)
    assert g.num_nodes > 200
    bg = pad_graphs([g], g.num_nodes + 1, g.num_edges, graph_cap=1)
    embed = GraphEmbedding(hidden_dim=16)
    block = ChempropBlock(hidden_dim=16, depth=2)
    key = jax.random.PRNGKey(0)
    G = embed.apply(embed.init(key, bg), bg)
    out = block.apply(block.init(key, G), G)
    assert np.isfinite(np.asarray(out.node_feats)).all()


def test_size_sorted_batching_cuts_padding(rng):
    """sort_by_size groups similar molecules: dense padding waste drops."""
    import csv
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "lipo.csv")
    with open(path) as f:
        smis = [r["smiles"] for r in csv.DictReader(f)][:256]
    ds = MolecularDataset(
        {"smiles": smis, "y": rng.normal(size=len(smis))},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"])},
    )

    def padding_ratio(loader):
        padded = real = 0
        for batch in loader:
            G = batch["inputs.G"]
            padded += G.n_graphs * G.edges_per_graph
            real += int(np.asarray(G.edge_mask).sum())
        return padded / real

    plain = padding_ratio(DataLoader(ds, batch_size=32, layout="dense"))
    sorted_ = padding_ratio(
        DataLoader(ds, batch_size=32, layout="dense", sort_by_size=True, shuffle=True)
    )
    assert sorted_ < plain * 0.75, (plain, sorted_)
    # all molecules still delivered exactly once
    loader = DataLoader(ds, batch_size=32, layout="dense", sort_by_size=True, shuffle=True)
    n = sum(int(np.asarray(b["inputs.G"].graph_mask).sum()) for b in loader)
    assert n == len(smis)


def test_stack_trees_device_and_host_leaves():
    """stack_trees: device leaves stack on device (no host round-trip),
    host leaves stack on host; mixed trees keep per-leaf behavior."""
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.batching import stack_trees

    host = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(4, np.int32)}
    dev = {k: jnp.asarray(v) for k, v in host.items()}

    s_host = stack_trees([host, host])
    assert isinstance(s_host["a"], np.ndarray) and s_host["a"].shape == (2, 2, 3)
    s_dev = stack_trees([dev, dev])
    assert isinstance(s_dev["a"], jax.Array) and s_dev["a"].shape == (2, 2, 3)
    np.testing.assert_array_equal(np.asarray(s_dev["b"]), s_host["b"])


def test_shape_signature_distinguishes_shape_and_dtype():
    from notorch_tpu.data.batching import shape_signature

    a = {"x": np.zeros((2, 3), np.float32)}
    b = {"x": np.zeros((2, 3), np.float32)}
    c = {"x": np.zeros((2, 4), np.float32)}
    d = {"x": np.zeros((2, 3), np.int32)}
    assert shape_signature(a) == shape_signature(b)
    assert shape_signature(a) != shape_signature(c)
    assert shape_signature(a) != shape_signature(d)

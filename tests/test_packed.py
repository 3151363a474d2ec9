"""Bin-packed dense layout: packing invariants, cross-layout parity, and
end-to-end training.

The packed layout puts several molecules in one [V_bin, E_bin] block with
per-molecule node-id offsets — the SAME dense/fused kernels stay exact
because their one-hot compares cannot match across disjoint id ranges —
and reads out per molecule with a segment-sum over ``node_graph``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.batching import DataLoader
from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.nn.chemprop_dense import (
    DenseChempropBlock,
    DenseGraphEmbedding,
    DenseSum,
    PackedMean,
    PackedSum,
)
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())
SMIS = [
    "CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "C1CC1CO", "CCN(CC)CC",
    "O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "CNC", "c1ccc2ccccc2c1", "CC#N",
]


def test_pack_invariants():
    graphs = [PIPE(s) for s in SMIS]
    V_b, E_b = 40, 64
    bg = pack_graphs_dense(graphs, V_b, E_b, np_out=True)

    total_v = sum(g.num_nodes for g in graphs)
    total_e = sum(g.num_edges for g in graphs)
    assert bg.node_mask.sum() == total_v
    assert bg.edge_mask.sum() == total_e
    assert bg.n_mols == len(graphs)

    # bin plan respects capacities and covers every molecule once
    bins = plan_bins(graphs, V_b, E_b)
    assert sorted(i for b in bins for i in b) == list(range(len(graphs)))
    for b in bins:
        assert sum(graphs[i].num_nodes for i in b) <= V_b - 1
        assert sum(graphs[i].num_edges for i in b) <= E_b

    # node_graph covers each molecule with exactly its node count; padding
    # slots carry the trash id
    ids, counts = np.unique(bg.node_graph, return_counts=True)
    for i, g in enumerate(graphs):
        assert counts[list(ids).index(i)] == g.num_nodes
    assert bg.node_graph.max() == len(graphs)  # trash segment present

    # real edges never touch the per-bin sink slot; padding edges do
    assert (bg.src[bg.edge_mask] < V_b - 1).all()
    assert (bg.src[~bg.edge_mask] == V_b - 1).all()

    # every real edge's endpoints belong to the SAME molecule (offsets are
    # consistent) and pair-interleaving survives packing
    for b in range(bg.src.shape[0]):
        for e in range(E_b):
            if not bg.edge_mask[b, e]:
                continue
            assert bg.node_graph[b, bg.src[b, e]] == bg.node_graph[b, bg.dst[b, e]]
        # pair partner is the reverse edge
        for e in range(0, E_b, 2):
            if bg.edge_mask[b, e]:
                assert bg.src[b, e] == bg.dst[b, e + 1]
                assert bg.dst[b, e] == bg.src[b, e + 1]


def test_pack_rejects_oversized():
    graphs = [PIPE("CC(=O)Nc1ccc(O)cc1")]
    with pytest.raises(ValueError):
        pack_graphs_dense(graphs, 8, 64)
    with pytest.raises(ValueError):
        pack_graphs_dense(graphs, 40, 10)


@pytest.mark.parametrize("fused", [False, True])
def test_packed_matches_per_molecule_layout(fused):
    """embed -> block -> per-molecule readout is identical (up to float
    assoc.) between the packed and per-molecule dense layouts."""
    from notorch_tpu.nn.chemprop_dense import FusedDenseChempropBlock

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 3
    key = jax.random.PRNGKey(5)

    dense_bg = pad_graphs_dense(graphs, 32, 64)
    packed_bg = pack_graphs_dense(graphs, 40, 64)

    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(key, dense_bg)
    Gd = embed.apply(ev, dense_bg)
    Gp = embed.apply(ev, packed_bg)

    if fused:
        block = FusedDenseChempropBlock(hidden_dim=d, depth=depth, mols_per_tile=2)
    else:
        block = DenseChempropBlock(hidden_dim=d, depth=depth)
    bv = block.init(key, Gd)

    out_d = block.apply(bv, Gd)
    out_p = block.apply(bv, Gp)
    H_d = DenseSum().apply({}, out_d)
    H_p = PackedSum().apply({}, out_p)
    np.testing.assert_allclose(
        np.asarray(H_p), np.asarray(H_d), rtol=2e-4, atol=2e-4
    )

    # gradients through the packed pipeline equal the per-molecule ones
    y = jax.random.normal(jax.random.PRNGKey(1), (len(graphs), d))

    def loss_d(params):
        out = block.apply(params, Gd)
        return ((DenseSum().apply({}, out) - y) ** 2).sum()

    def loss_p(params):
        out = block.apply(params, Gp)
        return ((PackedSum().apply({}, out) - y) ** 2).sum()

    g_d = jax.grad(loss_d)(bv)
    g_p = jax.grad(loss_p)(bv)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3)


def test_packed_mean_counts():
    graphs = [PIPE(s) for s in SMIS]
    packed_bg = pack_graphs_dense(graphs, 40, 64)
    d = 8
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(jax.random.PRNGKey(0), packed_bg)
    Gp = embed.apply(ev, packed_bg)
    s = PackedSum().apply({}, Gp)
    m = PackedMean().apply({}, Gp)
    counts = np.array([g.num_nodes for g in graphs], np.float32)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(s) / counts[:, None], rtol=1e-5
    )


def test_packed_sharded_dp_matches_single_device():
    """DataLoader(layout='dense_packed', shards=k) packs each contiguous
    molecule chunk into its own equal run of bins with chunk-local readout
    ids; DenseSpmdTrainer's leading-axis split then keeps every device
    local and training matches the unsharded packed run."""
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.parallel.dense_dp import DenseSpmdTrainer
    from notorch_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    rng = np.random.default_rng(3)
    smis = (SMIS * 2)[:16]
    ys = rng.normal(size=len(smis))
    ds = MolecularDataset(
        {"smiles": smis, "y": list(ys)},
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"], task="regression")},
    )
    model = build_dmpnn(hidden_dim=32, depth=2, layout="dense_packed")

    single = next(iter(DataLoader(ds, batch_size=16, layout="dense_packed", bin_edges=64)))
    sharded = next(
        iter(DataLoader(ds, batch_size=16, layout="dense_packed", bin_edges=64, shards=4))
    )
    G = [v for v in sharded.values() if hasattr(v, "node_graph")][0]
    assert G.n_mols == 4  # chunk-local ids
    assert G.n_graphs % 4 == 0

    state_ref = model.init(jax.random.PRNGKey(0), single)
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    trainer = DenseSpmdTrainer(model, mesh)
    state_spmd = jax.device_get(state_ref)
    import flax

    state_spmd = jax.tree.map(jnp.asarray, state_spmd)

    losses_ref, losses_spmd = [], []
    for _ in range(5):
        state_ref, logs_ref = model.train_step(state_ref, single)
        state_spmd, logs_spmd = trainer.train_step(state_spmd, sharded)
        losses_ref.append(float(logs_ref["train/loss"]))
        losses_spmd.append(float(logs_spmd["train/loss"]))
    np.testing.assert_allclose(losses_spmd, losses_ref, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_spmd.params), jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_packed_end_to_end_training(smis=None):
    """build_dmpnn(layout='dense_packed') + DataLoader(layout='dense_packed')
    overfits a tiny set; predictions align with batch rows."""
    rng = np.random.default_rng(0)
    smis = SMIS + ["CCOC(=O)C", "c1ccncc1", "CCCCCC", "CC(C)O", "CS(=O)(=O)C", "NCCO"]
    ys = rng.normal(size=len(smis))

    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager

    ds = MolecularDataset(
        {"smiles": smis, "y": list(ys)},
        transforms={
            "graph": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"], task="regression")},
    )
    loader = DataLoader(ds, batch_size=16, layout="dense_packed", bin_edges=64)
    model = build_dmpnn(hidden_dim=32, depth=2, layout="dense_packed", learning_rate=5e-3)
    batch = next(iter(loader))
    state = model.init(jax.random.PRNGKey(0), batch)
    first = None
    for _ in range(150):
        state, logs = model.train_step(state, batch)
        if first is None:
            first = float(logs["train/loss"])
    last = float(logs["train/loss"])
    assert np.isfinite(last) and last < first * 0.2, (first, last)

    out = model.predict_step(state.params, batch, None)
    preds = np.asarray(out["ffn.preds"])[: len(smis), 0]
    assert preds.shape == (len(smis),)
    # overfit => predictions track targets in ORDER (alignment check)
    assert np.corrcoef(preds, ys)[0, 1] > 0.9


def test_fused_block_wide_bins_train(smis):
    """Large molecules push ladder bins past 128 edges; the fused block must
    scale its tile down (tile*E <= 1024) and still train — a full-lipo
    production run OOM'd Mosaic's scoped VMEM at E_b=256 x tile 8 before
    the adaptive tile (round 4)."""
    import optax

    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    # a 100-carbon chain: 99 bonds -> 198 directed edges -> 256-edge bins
    big = "C" * 100
    mols = [big] + list(smis[:7])
    rng = np.random.default_rng(0)
    ds = MolecularDataset(
        {"smiles": mols, "y": rng.normal(size=len(mols))},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_dmpnn(hidden_dim=32, depth=2, optimizer=optax.adam(1e-3))
    loader = DataLoader(ds, batch_size=8, layout="dense_packed")
    batch = next(iter(loader))
    assert batch["inputs.G"].edge_feats.shape[1] >= 256  # the wide-bin case
    state = model.init(jax.random.PRNGKey(0), batch)
    state, logs = model.train_step(state, batch)
    assert np.isfinite(float(logs["train/loss"]))

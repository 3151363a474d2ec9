"""Pallas fused D-MPNN kernel: parity with the jnp dense path (interpret
mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from notorch_tpu.data.dense import pad_graphs_dense, rev_pair_swap
from notorch_tpu.kernels.dense_mpnn import fused_dense_mpnn_block
from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())
SMIS = ["CCO", "c1ccccc1C(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "NC(=O)c1ccccc1"]


def test_fused_kernel_matches_dense_block():
    graphs = [PIPE(s) for s in SMIS]
    d = 32
    depth = 3
    dbg = pad_graphs_dense(graphs, nodes_per_graph=32, edges_per_graph=64)

    key = jax.random.PRNGKey(0)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    ref = block.apply(bv, G)

    # same computation through the fused kernel
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    Ws = jnp.stack(
        [bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)]
    )
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    out = fused_dense_mpnn_block(
        h0,
        G.src,
        G.dst,
        G.edge_mask,
        Ws,
        bs,
        depth=depth,
        n_nodes=32,
        residual=True,
        mols_per_tile=2,
        interpret=True,
    )

    emask = np.asarray(G.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out)[emask], np.asarray(ref.edge_feats)[emask], rtol=1e-4, atol=1e-4
    )


def test_fused_kernel_bf16_matmuls_close_to_f32():
    """matmul_dtype="bfloat16" keeps f32 state and lands near the f32 result
    (MXU-operand rounding only)."""
    graphs = [PIPE(s) for s in SMIS]
    d, depth = 32, 3
    dbg = pad_graphs_dense(graphs, nodes_per_graph=32, edges_per_graph=64)
    key = jax.random.PRNGKey(7)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    ref = block.apply(bv, G)

    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    Ws = jnp.stack(
        [bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)]
    )
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    out = fused_dense_mpnn_block(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=32, residual=True, mols_per_tile=2, interpret=True,
        matmul_dtype="bfloat16",
    )
    assert out.dtype == h0.dtype  # state stays f32
    emask = np.asarray(G.edge_mask)
    a, b = np.asarray(out)[emask], np.asarray(ref.edge_feats)[emask]
    denom = np.abs(b).max()
    assert np.abs(a - b).max() / denom < 0.05


def test_fused_kernel_non_residual():
    graphs = [PIPE(s) for s in SMIS[:2]]
    d, depth = 16, 2
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(1)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth, residual=False)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    ref = block.apply(bv, G)

    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    Ws = jnp.stack(
        [bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)]
    )
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    out = fused_dense_mpnn_block(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=32, residual=False, mols_per_tile=2, interpret=True,
    )
    emask = np.asarray(G.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out)[emask], np.asarray(ref.edge_feats)[emask], rtol=1e-4, atol=1e-4
    )


def test_fused_kernel_custom_vjp_grads():
    """Gradients through the trainable fused kernel match jnp autodiff."""
    from notorch_tpu.kernels.dense_mpnn import fused_dense_mpnn_block_trainable

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 2
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(2)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    emask = G.edge_mask.astype(jnp.float32)[..., None]

    def loss_fused(h0, Ws, bs):
        out = fused_dense_mpnn_block_trainable(
            h0, G.src, G.dst, G.edge_mask, Ws, bs, depth, 32, True, 2, True
        )
        return ((out * emask) ** 2).sum()

    def loss_ref(h0, Ws, bs):
        # same recurrence via plain jnp (autodiff ground truth)
        from notorch_tpu.kernels.dense_mpnn import _jnp_forward_collect

        S = G.scatter_matrix(jnp.float32)
        hs = _jnp_forward_collect(h0, S, Gm, Ws, bs, depth, True)
        return ((hs[-1] * emask) ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(h0, Ws, bs)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(h0, Ws, bs)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_fused_module_trains():
    """FusedDenseChempropBlock (Pallas + custom VJP) trains end to end."""
    import optax

    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
    from notorch_tpu.models.dmpnn import build_dmpnn
    from notorch_tpu.training.loop import fit

    rng = np.random.default_rng(5)
    smis = SMIS * 4
    # duplicated molecules share a target (so the task is fittable)
    y = np.tile(rng.normal(size=len(SMIS)), 4)
    ds = MolecularDataset(
        {"smiles": smis, "y": y},
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key="smiles")
        },
        targets={"y": TargetSpec(columns=["y"])},
    )
    model = build_dmpnn(
        hidden_dim=16, depth=2, layout="dense_fused", optimizer=optax.adam(5e-3)
    )
    loader = DataLoader(ds, batch_size=16, layout="dense")
    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    result = fit(model, state, loader, epochs=25)
    assert result.history[-1]["train/loss"] < result.history[0]["train/loss"] * 0.5


def test_fused_kernel_other_hidden_dims():
    """Kernel correctness across hidden dims (128 / 384) and odd tiles."""
    graphs = [PIPE(s) for s in SMIS]
    for d in [128, 384]:
        depth = 2
        dbg = pad_graphs_dense(graphs, 32, 64)
        key = jax.random.PRNGKey(d)
        embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
        block = DenseChempropBlock(hidden_dim=d, depth=depth)
        ev = embed.init(key, dbg)
        G = embed.apply(ev, dbg)
        bv = block.init(key, G)
        ref = block.apply(bv, G)

        Gm = G.gather_matrix(jnp.float32)
        h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
        Ws = jnp.stack(
            [bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)]
        )
        bs = jnp.stack(
            [bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)]
        )
        out = fused_dense_mpnn_block(
            h0, G.src, G.dst, G.edge_mask, Ws, bs,
            depth=depth, n_nodes=32, residual=True, mols_per_tile=4, interpret=True,
        )
        em = np.asarray(G.edge_mask)
        np.testing.assert_allclose(
            np.asarray(out)[em], np.asarray(ref.edge_feats)[em], rtol=1e-4, atol=1e-4
        )


def test_pallas_backward_matches_jnp_autodiff():
    """The Pallas backward kernel produces the same grads as jnp autodiff."""
    from notorch_tpu.kernels.dense_mpnn import (
        _jnp_forward_collect,
        fused_dense_mpnn_block_bwd,
    )

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 32, 3
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(3)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    # NONZERO biases: the recompute backward's forward replay must add the
    # per-layer bias (it silently omitted it before round 3 — zero-init
    # biases masked the bug)
    bs = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (depth, d), jnp.float32)
    Gm = G.gather_matrix(jnp.float32)
    S = G.scatter_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats

    # cotangent supported on REAL lanes: the folded kernel's VJP contract
    # (every production consumer masks padded edge lanes)
    cot = jax.random.normal(jax.random.PRNGKey(9), h0.shape, h0.dtype)
    cot = cot * G.edge_mask.astype(h0.dtype)[..., None]

    def fwd(h0, Ws, bs):
        hs = _jnp_forward_collect(h0, S, Gm, Ws, bs, depth, True)
        return (hs[-1] * cot).sum()

    g_ref = jax.grad(fwd, argnums=(0, 1, 2))(h0, Ws, bs)

    g_h0, g_W, g_b = fused_dense_mpnn_block_bwd(
        h0, G.src, G.dst, G.edge_mask, Ws, bs, cot,
        depth=depth, n_nodes=32, residual=True, mols_per_tile=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(g_h0), np.asarray(g_ref[0]), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_W), np.asarray(g_ref[1]), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_ref[2]), rtol=2e-4, atol=1e-4)


def test_trainable_fast_grads_match():
    """custom-VJP with Pallas fwd AND bwd == jnp autodiff."""
    from notorch_tpu.kernels.dense_mpnn import (
        _jnp_forward_collect,
        fused_dense_mpnn_block_trainable_fast,
    )

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 2
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(4)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    Gm = G.gather_matrix(jnp.float32)
    S = G.scatter_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    emask = G.edge_mask.astype(jnp.float32)[..., None]

    def loss_fast(h0, Ws, bs):
        out = fused_dense_mpnn_block_trainable_fast(
            h0, G.src, G.dst, G.edge_mask, Ws, bs, depth, 32, True, 2, True
        )
        return ((out * emask) ** 2).sum()

    def loss_ref(h0, Ws, bs):
        hs = _jnp_forward_collect(h0, S, Gm, Ws, bs, depth, True)
        return ((hs[-1] * emask) ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_fast, argnums=(0, 1, 2))(h0, Ws, bs)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(h0, Ws, bs)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_stash_forward_and_grads_match():
    """Residual-stash variant: the stashing forward equals the plain fused
    forward, the stashed hs equal the jnp replay, and the stash backward
    equals jnp autodiff."""
    from notorch_tpu.kernels.dense_mpnn import (
        _jnp_forward_collect,
        fused_dense_mpnn_block_stash,
        fused_dense_mpnn_block_trainable_stash,
    )

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 3
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(7)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    block = DenseChempropBlock(hidden_dim=d, depth=depth)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    bv = block.init(key, G)
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    Gm = G.gather_matrix(jnp.float32)
    S = G.scatter_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    emask = G.edge_mask.astype(jnp.float32)[..., None]

    out, hs = fused_dense_mpnn_block_stash(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=32, residual=True, mols_per_tile=2, interpret=True,
    )
    ref_out = fused_dense_mpnn_block(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=32, residual=True, mols_per_tile=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    hs_ref = _jnp_forward_collect(h0, S, Gm, Ws, bs, depth, True)
    assert hs.shape[0] == depth - 1  # h0 is never duplicated into the stash
    em = np.asarray(G.edge_mask)
    for l in range(1, depth):  # stashed hidden-layer inputs h1..h_{depth-1}
        # real lanes only: the folded kernel's padded-lane values differ
        # from the jnp form by design (no swap subtraction there)
        np.testing.assert_allclose(
            np.asarray(hs[l - 1])[em], np.asarray(hs_ref[l])[em], rtol=1e-4, atol=1e-4
        )

    def loss_stash(h0, Ws, bs):
        out = fused_dense_mpnn_block_trainable_stash(
            h0, G.src, G.dst, G.edge_mask, Ws, bs, depth, 32, True, 2, True
        )
        return ((out * emask) ** 2).sum()

    def loss_ref(h0, Ws, bs):
        hs = _jnp_forward_collect(h0, S, Gm, Ws, bs, depth, True)
        return ((hs[-1] * emask) ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_stash, argnums=(0, 1, 2))(h0, Ws, bs)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(h0, Ws, bs)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)

    # bf16 stash: same gradients to bf16 rounding (the residuals the
    # backward reads carry ~0.4% relative rounding)
    def loss_bf16(h0, Ws, bs):
        out = fused_dense_mpnn_block_trainable_stash(
            h0, G.src, G.dst, G.edge_mask, Ws, bs, depth, 32, True, 2, True,
            None, "bfloat16",
        )
        return ((out * emask) ** 2).sum()

    v3, g3 = jax.value_and_grad(loss_bf16, argnums=(0, 1, 2))(h0, Ws, bs)
    np.testing.assert_allclose(float(v3), float(v2), rtol=1e-4)
    for a, b in zip(g3, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2, atol=3e-2)

    # depth == 1: nothing to stash; the variant must still be exact
    def loss_stash_d1(h0, Ws, bs):
        out = fused_dense_mpnn_block_trainable_stash(
            h0, G.src, G.dst, G.edge_mask, Ws[:1], bs[:1], 1, 32, True, 2, True
        )
        return ((out * emask) ** 2).sum()

    def loss_ref_d1(h0, Ws, bs):
        hs = _jnp_forward_collect(h0, S, Gm, Ws[:1], bs[:1], 1, True)
        return ((hs[-1] * emask) ** 2).sum()

    v4, g4 = jax.value_and_grad(loss_stash_d1, argnums=(0, 1, 2))(h0, Ws, bs)
    v5, g5 = jax.value_and_grad(loss_ref_d1, argnums=(0, 1, 2))(h0, Ws, bs)
    np.testing.assert_allclose(float(v4), float(v5), rtol=1e-4)
    for a, b in zip(g4, g5):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_encoder_kernel_forward_and_grads_match():
    """v3 whole-encoder kernel (gather + block + scatter in one pallas_call):
    node/edge outputs and gradients w.r.t. BOTH feature inputs and the
    stacked weights match the jnp dense path."""
    import pytest

    from notorch_tpu.kernels.dense_mpnn import fused_dense_encoder

    graphs = [PIPE(s) for s in SMIS]
    d = 16
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(11)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    nmask = G.node_mask.astype(jnp.float32)[..., None]
    emask = G.edge_mask.astype(jnp.float32)[..., None]

    for depth in (1, 3):
        block = DenseChempropBlock(hidden_dim=d, depth=depth)
        bv = block.init(key, G)
        Ws = jnp.stack(
            [bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)]
        )
        bs = jnp.stack(
            [bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)]
        )

        def loss_enc(nf, ef, Ws, bs, depth=depth):
            nh, eh = fused_dense_encoder(
                nf, ef, G.src, G.dst, G.edge_mask, Ws, bs,
                depth, True, 2, True, None, None,
            )
            return ((nh * nmask) ** 2).sum() + ((eh * emask) ** 2).sum()

        def loss_ref(nf, ef, Ws, bs, depth=depth, block=block):
            params = {
                f"layer_{i}": {"update": {"kernel": Ws[i], "bias": bs[i]}}
                for i in range(depth)
            }
            out = block.apply(
                {"params": params}, G.update(node_feats=nf, edge_feats=ef)
            )
            return ((out.node_feats * nmask) ** 2).sum() + (
                (out.edge_feats * emask) ** 2
            ).sum()

        args = (G.node_feats, G.edge_feats, Ws, bs)
        v1, g1 = jax.value_and_grad(loss_enc, argnums=(0, 1, 2, 3))(*args)
        v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
            )


def test_fused_module_fuse_ends_matches_jnp_dense():
    """FusedDenseChempropBlock(fuse_ends=True) is numerically the jnp
    DenseChempropBlock (forward and grads), with the same param tree."""
    from notorch_tpu.nn.chemprop_dense import FusedDenseChempropBlock

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 3
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(13)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    dense = DenseChempropBlock(hidden_dim=d, depth=depth)
    fused = FusedDenseChempropBlock(
        hidden_dim=d, depth=depth, mols_per_tile=2, fuse_ends=True
    )
    dv = dense.init(key, G)
    fv = fused.init(key, G)
    assert jax.tree.structure(dv) == jax.tree.structure(fv)
    nmask = G.node_mask.astype(jnp.float32)[..., None]

    def loss(mod, vs):
        out = mod.apply(vs, G)
        return ((out.node_feats * nmask) ** 2).sum()

    v_d, g_d = jax.value_and_grad(lambda p: loss(dense, p))(dv)
    v_f, g_f = jax.value_and_grad(lambda p: loss(fused, p))(dv)  # same params
    np.testing.assert_allclose(float(v_f), float(v_d), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_fused_module_params_interchangeable_with_dense():
    """FusedDenseChempropBlock's param tree equals DenseChempropBlock's
    (layer_i/update/{kernel,bias}), so checkpoints move between the fused
    (TPU) and jnp (CPU) paths."""
    from notorch_tpu.nn.chemprop_dense import FusedDenseChempropBlock

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 2
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(9)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)

    dense = DenseChempropBlock(hidden_dim=d, depth=depth)
    fused = FusedDenseChempropBlock(hidden_dim=d, depth=depth, mols_per_tile=2)
    dv = dense.init(key, G)
    fv = fused.init(key, G)
    assert jax.tree.structure(dv) == jax.tree.structure(fv)
    # apply the fused module with the DENSE module's params: same output
    ref = dense.apply(dv, G)
    out = fused.apply(dv, G)
    emask = np.asarray(G.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out.edge_feats)[emask], np.asarray(ref.edge_feats)[emask],
        rtol=1e-4, atol=1e-4,
    )


def test_fused_module_stash_backward_trains():
    """The stash-backward module variant produces finite grads end to end."""
    from notorch_tpu.nn.chemprop_dense import FusedDenseChempropBlock

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 16, 2
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(11)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    recompute = FusedDenseChempropBlock(hidden_dim=d, depth=depth, mols_per_tile=2)
    stash = FusedDenseChempropBlock(
        hidden_dim=d, depth=depth, mols_per_tile=2, backward="stash"
    )
    fv = recompute.init(key, G)

    def loss(mod, params):
        out = mod.apply(params, G)
        m = G.edge_mask.astype(jnp.float32)[..., None]
        return ((out.edge_feats * m) ** 2).sum()

    v_r, g_r = jax.value_and_grad(lambda p: loss(recompute, p))(fv)
    v_s, g_s = jax.value_and_grad(lambda p: loss(stash, p))(fv)
    np.testing.assert_allclose(float(v_r), float(v_s), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        ),
        g_r, g_s,
    )


def _jnp_folded_forward(h0, src, dst, edge_mask, Ws, bs, depth, residual=True):
    """The FOLDED recurrence in plain jnp: A'[e,e'] = [src(e)==dst(e')] *
    real(e') * [e' != rev(e)] — exactly what the Pallas kernels compute,
    including on padded lanes (where it differs from the unfolded form by
    the missing swap subtraction)."""
    B, E = src.shape
    e = jnp.arange(E)
    rev = e + 1 - 2 * (e % 2)
    keep = (src[:, :, None] == dst[:, None, :]) & edge_mask[:, None, :]
    A = jnp.where(keep & (e[None, :] != rev[:, None])[None], 1.0, 0.0).astype(h0.dtype)
    h = h0
    for l in range(depth):
        m = jnp.maximum(h, 0.0)
        out = jnp.einsum("bef,bfd->bed", A, m @ Ws[l]) + bs[l]
        h = h + out if residual else out
    return h


def test_pallas_backwards_are_exact_vjp_of_folded_forward():
    """The Pallas backwards (recompute AND stash) are the exact VJP of the
    kernel's own FOLDED forward for an ARBITRARY (unmasked) cotangent — not
    just for cotangents supported on real lanes. (The jnp-reference parity
    test above masks the cotangent because the UNFOLDED jnp form differs on
    padded lanes; this pins the folded kernel's self-consistency.)"""
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block,
        fused_dense_mpnn_block_bwd,
        fused_dense_mpnn_block_bwd_stash,
        fused_dense_mpnn_block_stash,
    )

    graphs = [PIPE(s) for s in SMIS]
    d, depth = 32, 3
    dbg = pad_graphs_dense(graphs, 32, 64)
    key = jax.random.PRNGKey(5)
    embed = DenseGraphEmbedding(42, 13, hidden_dim=d)
    ev = embed.init(key, dbg)
    G = embed.apply(ev, dbg)
    Ws = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (depth, d, d), jnp.float32)
    bs = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (depth, d), jnp.float32)
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats

    # the folded jnp reference IS the kernel forward, on every lane
    out_k = fused_dense_mpnn_block(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=32, mols_per_tile=2, interpret=True,
    )
    out_j = _jnp_folded_forward(h0, G.src, G.dst, G.edge_mask, Ws, bs, depth)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_j), rtol=1e-5, atol=1e-5)

    # UNMASKED cotangent — padded lanes included
    cot = jax.random.normal(jax.random.PRNGKey(9), h0.shape, h0.dtype)

    def fwd(h0, Ws, bs):
        return (
            _jnp_folded_forward(h0, G.src, G.dst, G.edge_mask, Ws, bs, depth) * cot
        ).sum()

    g_ref = jax.grad(fwd, argnums=(0, 1, 2))(h0, Ws, bs)

    g_rec = fused_dense_mpnn_block_bwd(
        h0, G.src, G.dst, G.edge_mask, Ws, bs, cot,
        depth=depth, n_nodes=32, mols_per_tile=2, interpret=True,
    )
    _, hs = fused_dense_mpnn_block_stash(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=32, mols_per_tile=2, interpret=True,
    )
    g_sta = fused_dense_mpnn_block_bwd_stash(
        h0, hs, G.src, G.dst, G.edge_mask, Ws, cot,
        depth=depth, n_nodes=32, mols_per_tile=2, interpret=True,
    )
    for name, got in (("recompute", g_rec), ("stash", g_sta)):
        for a, b in zip(got, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4,
                err_msg=f"{name} backward is not the exact VJP of the folded forward",
            )


def test_dbuf_forward_parity():
    """The manually double-buffered forward (ANY-memory h/out, static slot
    DMAs) matches the auto-pipelined kernel exactly, sum and mean."""
    import numpy as np

    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block,
        fused_dense_mpnn_block_dbuf,
    )

    rng = np.random.default_rng(0)
    B, E, d, depth, V = 32, 32, 16, 3, 24
    h0 = jnp.asarray(rng.normal(size=(B, E, d)).astype(np.float32))
    src_np = rng.integers(0, V, size=(B, E)).astype(np.int32)
    dst_np = np.empty_like(src_np)
    dst_np[:, 0::2] = src_np[:, 1::2]
    dst_np[:, 1::2] = src_np[:, 0::2]
    src, dst = jnp.asarray(src_np), jnp.asarray(dst_np)
    emask = jnp.asarray(rng.random((B, E)) < 0.8)
    Ws = jnp.asarray(rng.normal(size=(depth, d, d)).astype(np.float32) * 0.1)
    bs = jnp.asarray(rng.normal(size=(depth, d)).astype(np.float32) * 0.1)
    for reduce in ("sum", "mean"):
        ref = fused_dense_mpnn_block(
            h0, src, dst, emask, Ws, bs, depth=depth, n_nodes=V,
            mols_per_tile=8, interpret=True, reduce=reduce,
        )
        out = fused_dense_mpnn_block_dbuf(
            h0, src, dst, emask, Ws, bs, depth=depth, n_nodes=V,
            mols_per_tile=8, interpret=True, reduce=reduce,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    # odd tile counts refuse (callers fall back to the auto kernel)
    import pytest

    with pytest.raises(ValueError, match="dbuf"):
        fused_dense_mpnn_block_dbuf(
            h0[:24], src[:24], dst[:24], emask[:24], Ws, bs,
            depth=depth, n_nodes=V, mols_per_tile=8, interpret=True,
        )

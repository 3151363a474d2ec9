"""Padded-CSR Pallas segment-sum: parity on real molecule batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.graph import csr_row_ptr, pad_graphs, sort_edges_by_dst
from notorch_tpu.kernels.csr_segment import csr_segment_sum
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

PIPE = Pipeline(SmiToMol(), MolToGraph())


def test_sort_edges_by_dst_preserves_semantics():
    graphs = [PIPE(s) for s in ["CCO", "c1ccccc1C(=O)O", "NC(=O)c1ccccc1"]]
    bg = pad_graphs(graphs, 64, 128, graph_cap=3, np_out=True)
    sorted_bg, perm = sort_edges_by_dst(bg)

    dst = np.asarray(sorted_bg.dst)
    assert (np.diff(dst) >= 0).all()
    # rev is still an involution mapping each edge to its true reverse
    rev = np.asarray(sorted_bg.rev)
    assert (rev[rev] == np.arange(len(rev))).all()
    src = np.asarray(sorted_bg.src)
    assert (src[rev] == dst).all() and (dst[rev] == src).all()
    # padding edges (sink dst) sorted last
    em = np.asarray(sorted_bg.edge_mask)
    assert not em[dst == 63].any() or em.sum() == len(em)


def test_csr_segment_sum_matches_xla(rng):
    graphs = [PIPE(s) for s in ["CCO", "c1ccccc1C(=O)O", "NC(=O)c1ccccc1", "CCCCCCCC"]]
    bg = pad_graphs(graphs, 128, 256, graph_cap=4, np_out=True)
    sorted_bg, _ = sort_edges_by_dst(bg)
    row_ptr = csr_row_ptr(np.asarray(sorted_bg.dst), 128)

    d = 32
    data = jnp.asarray(rng.normal(size=(256, d)).astype(np.float32))
    out = csr_segment_sum(
        data,
        jnp.asarray(sorted_bg.dst),
        jnp.asarray(row_ptr),
        num_nodes=128,
        tile_v=32,
        tile_e=64,
        interpret=True,
    )
    expect = jax.ops.segment_sum(data, jnp.asarray(sorted_bg.dst), num_segments=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_csr_segment_sum_random_sorted(rng):
    """Random sorted segment ids, including empty and over-full nodes."""
    V, E, d = 64, 512, 16
    dst = np.sort(rng.integers(0, V, size=E)).astype(np.int32)
    data = rng.normal(size=(E, d)).astype(np.float32)
    row_ptr = csr_row_ptr(dst, V)
    out = csr_segment_sum(
        jnp.asarray(data), jnp.asarray(dst), jnp.asarray(row_ptr),
        num_nodes=V, tile_v=16, tile_e=64, max_degree=32, interpret=True,
    )
    expect = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(dst), num_segments=V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-4)


class TestPackedCsr:
    """Tile-packed CSR segment-sum: static block maps, no scalar prefetch."""

    def _case(self, V=256, E=1024, d=32, seed=0):
        rng = np.random.default_rng(seed)
        dst = rng.integers(0, V, size=E).astype(np.int32)
        data = rng.normal(size=(E, d)).astype(np.float32)
        return dst, data

    def test_pack_edges_by_tile(self):
        from notorch_tpu.kernels.csr_segment import pack_edges_by_tile

        dst, _ = self._case()
        perm, packed_dst, budget = pack_edges_by_tile(dst, num_nodes=256, tile_v=128)
        assert budget % 128 == 0
        # every real edge appears exactly once; padding is -1
        real = perm[perm >= 0]
        assert sorted(real.tolist()) == list(range(len(dst)))
        # packed dst matches the permuted edges and stays in its tile
        for slot, e in enumerate(perm):
            if e >= 0:
                assert packed_dst[slot] == dst[e]
                assert dst[e] // 128 == slot // budget
            else:
                assert packed_dst[slot] == -1

    def test_packed_matches_segment_sum(self):
        from notorch_tpu.kernels.csr_segment import (
            csr_segment_sum_packed,
            pack_edges_by_tile,
        )

        dst, data = self._case()
        perm, packed_dst, _ = pack_edges_by_tile(dst, num_nodes=256, tile_v=128)
        out = csr_segment_sum_packed(
            jnp.asarray(data), jnp.asarray(perm), jnp.asarray(packed_dst),
            num_nodes=256, interpret=True,
        )
        ref = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(dst), num_segments=256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_packed_budget_overflow_raises(self):
        from notorch_tpu.kernels.csr_segment import pack_edges_by_tile

        dst = np.zeros(300, np.int32)  # all edges land in tile 0
        with pytest.raises(ValueError, match="exceeds budget"):
            pack_edges_by_tile(dst, num_nodes=256, tile_v=128, budget=256)


class TestCsrImplIntegration:
    """impl='csr' in the flat ChempropBlock (tile-packed Pallas reduce)."""

    def _batch(self, d=16):
        from notorch_tpu.data.graph import pad_graphs, with_csr_packing
        from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

        pipe = Pipeline(SmiToMol(), MolToGraph())
        graphs = [pipe(s) for s in ["CCO", "c1ccccc1C(=O)O", "CC(C)CC", "O"]]
        bg = pad_graphs(graphs, 128, 128, graph_cap=4)
        bg = with_csr_packing(bg)
        rng = np.random.default_rng(0)
        return bg.update(
            node_feats=jnp.asarray(rng.normal(size=(bg.num_nodes, d)).astype(np.float32)),
            edge_feats=jnp.asarray(rng.normal(size=(bg.num_edges, d)).astype(np.float32)),
        )

    def test_with_csr_packing_metadata(self):
        bg = self._batch()
        assert bg.csr_perm is not None and bg.csr_dst is not None
        perm = np.asarray(bg.csr_perm)
        mask = np.asarray(bg.edge_mask)
        real = perm[perm >= 0]
        # exactly the real (unmasked) edges are packed, each once
        assert sorted(real.tolist()) == np.nonzero(mask)[0].tolist()

    def test_block_csr_matches_segment(self):
        from notorch_tpu.nn.chemprop import ChempropBlock

        bg = self._batch()
        seg = ChempropBlock(hidden_dim=16, depth=2, impl="segment")
        csr = ChempropBlock(hidden_dim=16, depth=2, impl="csr")
        params = seg.init(jax.random.PRNGKey(0), bg)

        out_seg = seg.apply(params, bg)
        out_csr = csr.apply(params, bg)
        vmask = np.asarray(bg.node_mask)
        np.testing.assert_allclose(
            np.asarray(out_csr.node_feats)[vmask],
            np.asarray(out_seg.node_feats)[vmask],
            rtol=2e-5, atol=2e-5,
        )
        emask = np.asarray(bg.edge_mask)
        np.testing.assert_allclose(
            np.asarray(out_csr.edge_feats)[emask],
            np.asarray(out_seg.edge_feats)[emask],
            rtol=2e-5, atol=2e-5,
        )

    def test_block_csr_grads_match_segment(self):
        from notorch_tpu.nn.chemprop import ChempropBlock

        bg = self._batch()
        vmask = jnp.asarray(np.asarray(bg.node_mask))

        def loss_fn(module):
            def f(p):
                out = module.apply(p, bg)
                return (jnp.where(vmask[:, None], out.node_feats, 0.0) ** 2).mean()
            return f

        seg = ChempropBlock(hidden_dim=16, depth=2, impl="segment")
        csr = ChempropBlock(hidden_dim=16, depth=2, impl="csr")
        params = seg.init(jax.random.PRNGKey(0), bg)
        l_seg, g_seg = jax.value_and_grad(loss_fn(seg))(params)
        l_csr, g_csr = jax.value_and_grad(loss_fn(csr))(params)
        np.testing.assert_allclose(float(l_csr), float(l_seg), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_seg), jax.tree.leaves(g_csr)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6)

    def test_train_end_to_end_csr(self, tmp_path):
        """The CLI trains with model.impl=csr (loader packs automatically)."""
        import pandas as pd

        from notorch_tpu.cli.train import apply_overrides, load_config, run

        cfg = load_config("configs/dmpnn_regression.yaml")
        apply_overrides(
            cfg,
            ["trainer.epochs=1", "trainer.batch_size=32", "model.hidden_dim=16",
             "model.depth=1", "model.impl=csr"],
        )
        small = tmp_path / "lipo_small.csv"
        pd.read_csv("tests/data/lipo.csv").head(80).to_csv(small, index=False)
        cfg["data"]["csv"] = str(small)
        out = run(cfg)
        assert np.isfinite(out["history"][-1]["train/loss"])

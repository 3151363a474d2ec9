"""Padded-CSR Pallas segment-sum: parity on real molecule batches."""

import jax
import jax.numpy as jnp
import numpy as np

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

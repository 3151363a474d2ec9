"""Boundary-exchange (halo) edge partitioning: exactness at 2/4/8 shards,
gradient exactness, comm-volume bound, zero-boundary fast path.

The unsharded oracle is the plain flat D-MPNN recurrence (reference
``notorch/nn/gnn/chemprop.py:28-88`` semantics) evaluated in jnp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from notorch_tpu.data.graph import Graph, pad_graphs
from notorch_tpu.parallel.halo import (
    HaloShard,
    comm_bytes_per_step,
    halo_mpnn_block,
    partition_edges_halo,
)
from notorch_tpu.parallel.mesh import make_mesh
from notorch_tpu.parallel.partition import stack_pytrees

DEPTH = 3
D = 16


def _pairs_to_graph(pairs, V):
    """Build a Graph from undirected (u, v) pairs: interleaved directed
    edges, rev = pairwise swap."""
    src, dst = [], []
    for u, v in pairs:
        src += [u, v]
        dst += [v, u]
    E = len(src)
    rev = np.arange(E, dtype=np.int32)
    rev[0::2] += 1
    rev[1::2] -= 1
    rng = np.random.default_rng(0)
    return Graph(
        node_types=rng.integers(0, 5, size=(V, 2)).astype(np.int32),
        edge_types=rng.integers(0, 3, size=(E, 1)).astype(np.int32),
        src=np.asarray(src, np.int32),
        dst=np.asarray(dst, np.int32),
        rev=rev,
    )


def _giant_graph(V_real=250, cross_every=40):
    """A path graph (mostly-local edges under contiguous blocks) plus a few
    long-range chords — small but nonzero boundary at any contiguous split."""
    pairs = [(i, i + 1) for i in range(V_real - 1)]
    pairs += [(i, i + V_real // 3) for i in range(0, V_real // 2, cross_every)]
    return _pairs_to_graph(pairs, V_real)


def _oracle(bg, node_embed, edge_embed, weights, biases, residual=True):
    """Unsharded flat recurrence on the global padded graph."""
    src, dst, rev = (jnp.asarray(x) for x in (bg.src, bg.dst, bg.rev))
    V = bg.num_nodes
    h = node_embed[src] + edge_embed
    for layer in range(weights.shape[0]):
        m = jax.nn.relu(h)
        m_v = jax.ops.segment_sum(m, dst, num_segments=V)
        out = (m_v[src] - m[rev]) @ weights[layer] + biases[layer]
        h = h + out if residual else out
    node_h = jax.ops.segment_sum(h, dst, num_segments=V)
    return node_h, h


def _embeds(bg, seed=1):
    rng = np.random.default_rng(seed)
    node_embed = rng.normal(size=(bg.num_nodes, D)).astype(np.float32)
    edge_embed = rng.normal(size=(bg.num_edges, D)).astype(np.float32)
    weights = (rng.normal(size=(DEPTH, D, D)) * 0.3).astype(np.float32)
    biases = (rng.normal(size=(DEPTH, D)) * 0.1).astype(np.float32)
    return node_embed, edge_embed, weights, biases


def _shard_edge_embeds(shards, edge_embed):
    """Gather each shard's edge rows from the global edge array (padding
    slots -> zeros)."""
    return np.stack(
        [
            np.where(
                np.asarray(s.edge_ids)[:, None] >= 0,
                edge_embed[np.maximum(np.asarray(s.edge_ids), 0)],
                0.0,
            ).astype(np.float32)
            for s in shards
        ]
    )


def _squeeze(tree):
    return jax.tree.map(lambda x: x.reshape(x.shape[1:]), tree)


def _run_sharded(bg, node_embed, edge_embed, weights, biases, n):
    shards = partition_edges_halo(bg, n)
    stacked = stack_pytrees(shards)
    v_loc = shards[0].v_loc
    ne = node_embed.reshape(n, v_loc, D)
    ee = _shard_edge_embeds(shards, edge_embed)
    mesh = make_mesh({"graph": n}, devices=jax.devices()[:n])

    def local(shard, ne, ee, w, b):
        shard, ne, ee = _squeeze((shard, ne, ee))
        node_h, edge_h = halo_mpnn_block(ne, ee, shard, w, b, "graph")
        return node_h[None], edge_h[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("graph"), P("graph"), P("graph"), P(), P()),
        out_specs=(P("graph"), P("graph")),
        check_vma=False,
    )
    node_h, edge_h = jax.jit(fn)(stacked, ne, ee, weights, biases)
    return shards, np.asarray(node_h), np.asarray(edge_h)


@pytest.mark.multihost
@pytest.mark.parametrize("n", [2, 4, 8])
def test_halo_block_matches_oracle(n):
    g = _giant_graph()
    bg = pad_graphs([g], 256, 1024, graph_cap=1, np_out=True)
    node_embed, edge_embed, weights, biases = _embeds(bg)
    ref_nodes, ref_edges = _oracle(bg, jnp.asarray(node_embed),
                                   jnp.asarray(edge_embed), jnp.asarray(weights),
                                   jnp.asarray(biases))
    shards, node_h, edge_h = _run_sharded(
        bg, node_embed, edge_embed, weights, biases, n
    )
    nmask = np.asarray(bg.node_mask)
    np.testing.assert_allclose(
        node_h.reshape(-1, D)[nmask], np.asarray(ref_nodes)[nmask],
        rtol=2e-5, atol=2e-5,
    )
    ref_edges = np.asarray(ref_edges)
    for i, s in enumerate(shards):
        ids = np.asarray(s.edge_ids)
        real = ids >= 0
        np.testing.assert_allclose(
            edge_h[i][real], ref_edges[ids[real]], rtol=2e-5, atol=2e-5
        )


@pytest.mark.multihost
@pytest.mark.parametrize("n", [2, 4, 8])
def test_halo_gradients_exact(n):
    g = _giant_graph()
    bg = pad_graphs([g], 256, 1024, graph_cap=1, np_out=True)
    node_embed, edge_embed, weights, biases = _embeds(bg)
    nmask = jnp.asarray(np.asarray(bg.node_mask))

    def ref_loss(w):
        node_h, _ = _oracle(bg, jnp.asarray(node_embed), jnp.asarray(edge_embed),
                            w, jnp.asarray(biases))
        return jnp.sum((node_h * nmask[:, None]) ** 2)

    ref_val, ref_grad = jax.value_and_grad(ref_loss)(jnp.asarray(weights))

    shards = partition_edges_halo(bg, n)
    stacked = stack_pytrees(shards)
    v_loc = shards[0].v_loc
    ne = node_embed.reshape(n, v_loc, D)
    ee = _shard_edge_embeds(shards, edge_embed)
    mesh = make_mesh({"graph": n}, devices=jax.devices()[:n])

    def local_loss(w, shard, ne, ee):
        shard, ne, ee = _squeeze((shard, ne, ee))
        node_h, _ = halo_mpnn_block(ne, ee, shard, w, jnp.asarray(biases), "graph")
        local = jnp.sum((node_h * shard.node_mask[:, None]) ** 2)
        return jax.lax.psum(local, "graph")

    fn = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P("graph"), P("graph"), P("graph")),
        out_specs=P(),
        check_vma=False,
    )
    val, grad = jax.jit(jax.value_and_grad(lambda w: fn(w, stacked, ne, ee)))(
        jnp.asarray(weights)
    )
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=5e-4, atol=1e-4
    )


def test_halo_comm_volume_far_below_replication():
    """The headline property: boundary bytes << the replicated scheme's
    full-[V, d] psum bytes (VERDICT r1 #1 'comm-volume assertion')."""
    g = _giant_graph()
    bg = pad_graphs([g], 256, 1024, graph_cap=1, np_out=True)
    for n in (2, 4, 8):
        shards = partition_edges_halo(bg, n)
        halo_bytes = comm_bytes_per_step(shards[0], hidden_dim=256, depth=DEPTH)
        # replicated-node scheme: full [V, d] psum every layer + final reduce
        psum_bytes = (DEPTH + 1) * bg.num_nodes * 256 * 4
        assert halo_bytes * 4 <= psum_bytes, (
            f"n={n}: halo {halo_bytes} vs psum {psum_bytes}"
        )


@pytest.mark.multihost
def test_halo_zero_boundary_skips_exchange():
    """Blocks with no cross edges -> b_cap == 0 -> statically no all_to_all."""
    # two disjoint 31-node paths, each fitting one 32-node block
    pairs = [(i, i + 1) for i in range(30)] + [(32 + i, 33 + i) for i in range(30)]
    g = _pairs_to_graph(pairs, 64)
    # caps: V=64+pad->128? keep V=128 so v_loc=64 per shard at n=2
    bg = pad_graphs([g], 128, 256, graph_cap=1, np_out=True)
    shards = partition_edges_halo(bg, 2)
    # the path split at node 64 crosses nothing: all of graph 0 in shard 0
    assert shards[0].b_cap == 0
    node_embed, edge_embed, weights, biases = _embeds(bg)
    ref_nodes, _ = _oracle(bg, jnp.asarray(node_embed), jnp.asarray(edge_embed),
                           jnp.asarray(weights), jnp.asarray(biases))
    _, node_h, _ = _run_sharded(bg, node_embed, edge_embed, weights, biases, 2)
    nmask = np.asarray(bg.node_mask)
    np.testing.assert_allclose(
        node_h.reshape(-1, D)[nmask], np.asarray(ref_nodes)[nmask],
        rtol=2e-5, atol=2e-5,
    )


def test_partition_invariants():
    g = _giant_graph()
    bg = pad_graphs([g], 256, 1024, graph_cap=1, np_out=True)
    for n in (2, 4, 8):
        shards = partition_edges_halo(bg, n)
        assert len(shards) == n
        for s in shards:
            r = np.asarray(s.rev)
            E = s.num_edges
            assert ((r >= 0) & (r < E)).all()
            assert (r[r] == np.arange(E)).all()  # local involution
        # every real global edge appears on exactly one shard
        all_ids = np.concatenate(
            [np.asarray(s.edge_ids)[np.asarray(s.edge_mask)] for s in shards]
        )
        np.testing.assert_array_equal(
            np.sort(all_ids), np.nonzero(np.asarray(bg.edge_mask))[0]
        )
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(s.node_mask) for s in shards]),
            np.asarray(bg.node_mask),
        )

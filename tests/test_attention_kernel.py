"""Fused Pallas attention kernel: parity with the jnp dense path (interpret
mode on CPU — the same kernel code Mosaic compiles on TPU).

The jnp ``DenseGraphSelfAttention`` is itself parity-gated against the flat
oracle (tests/test_gat.py), so matching it transitively pins the kernel to
the reference semantics (``notorch/nn/gnn/attention.py:42``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
from notorch_tpu.nn.attention_dense import DenseGATBlock, DenseGraphSelfAttention
from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

SMIS = [
    "CCO", "c1ccccc1C(=O)O", "CC(C)CC(N)C(=O)O", "O", "CCN(CC)CC",
    "c1ccc2c(c1)cccc2", "CC(=O)Nc1ccc(O)cc1", "C1CCCCC1", "CCOC(=O)C",
    "NC(=O)c1ccccc1", "OCC(O)CO", "CSC",
]


@pytest.fixture(scope="module")
def packed():
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in SMIS]
    n_bins = len(plan_bins(graphs, 32, 64))
    n_bins = -(-n_bins // 2) * 2  # even bin count exercises a multi-tile grid
    pk = pack_graphs_dense(graphs, 32, 64, bin_cap=n_bins)
    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=16)
    ev = dembed.init(key, pk)
    return dembed.apply(ev, pk)


@pytest.mark.parametrize("edge_bias", [True, False])
def test_fused_attention_forward_parity(packed, edge_bias):
    key = jax.random.PRNGKey(1)
    ref = DenseGraphSelfAttention(hidden_dim=16, num_heads=2, edge_bias=edge_bias)
    params = ref.init(key, packed)
    out_ref = ref.apply(params, packed).node_feats

    fused = DenseGraphSelfAttention(
        hidden_dim=16, num_heads=2, edge_bias=edge_bias,
        impl="fused", bins_per_tile=2, interpret=True,
    )
    out_fused = fused.apply(params, packed).node_feats  # SAME params
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_attention_grad_parity(packed):
    """Full-block (attention + FFN + residual, depth 2) gradient parity:
    params AND input node features."""
    key = jax.random.PRNGKey(2)
    ref = DenseGATBlock(hidden_dim=16, depth=2, num_heads=2)
    params = ref.init(key, packed)
    fused = DenseGATBlock(
        hidden_dim=16, depth=2, num_heads=2,
        impl="fused", bins_per_tile=2, interpret=True,
    )

    def loss(block):
        def f(p, x):
            out = block.apply(p, packed.update(node_feats=x)).node_feats
            # weight the loss asymmetrically so cotangents aren't uniform
            w = jnp.arange(out.shape[-1], dtype=out.dtype)[None, None, :]
            return jnp.sum(jnp.sin(out) * w)
        return f

    x = packed.node_feats
    l_ref, g_ref = jax.value_and_grad(loss(ref), argnums=(0, 1))(params, x)
    l_fused, g_fused = jax.value_and_grad(loss(fused), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree.leaves(g_ref)
    flat_fused = jax.tree.leaves(g_fused)
    for a, b in zip(flat_fused, flat_ref):
        # atol floor: W_bias/bias and W_k/bias gradients are MATHEMATICALLY
        # zero (adding a constant to every unmasked score in a softmax row
        # is an invariance), so both impls produce only cancellation noise
        # there — verified against an f64 oracle in round 5
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-5
        )


def test_fused_attention_odd_batch(packed):
    """bins_per_tile larger than / not dividing the batch still routes
    through fit_attn_tile without changing the math."""
    key = jax.random.PRNGKey(3)
    ref = DenseGraphSelfAttention(hidden_dim=16, num_heads=2)
    params = ref.init(key, packed)
    out_ref = ref.apply(params, packed).node_feats
    fused = DenseGraphSelfAttention(
        hidden_dim=16, num_heads=2, impl="fused", bins_per_tile=64, interpret=True,
    )
    out_fused = fused.apply(params, packed).node_feats
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


def test_fit_attn_tile():
    from notorch_tpu.kernels.dense_attention import fit_attn_tile

    assert fit_attn_tile(8, 128, 256, 16) == 4  # tile 8 fails Mosaic compile
    assert fit_attn_tile(8, 32, 64, 6) in (1, 2)  # must divide the batch
    assert fit_attn_tile(8, 32, 64, 8) == 8


def test_fused_attention_pallas_fwd_v2_parity(packed):
    """fwd_impl='pallas' (head-in-grid v2 forward kernel) matches jnp."""
    key = jax.random.PRNGKey(4)
    ref = DenseGraphSelfAttention(hidden_dim=16, num_heads=2)
    params = ref.init(key, packed)
    out_ref = ref.apply(params, packed).node_feats
    fused = DenseGraphSelfAttention(
        hidden_dim=16, num_heads=2, impl="fused", bins_per_tile=2,
        interpret=True, fwd_impl="pallas",
    )
    out_fused = fused.apply(params, packed).node_feats
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


def test_factored_vjp_and_masked_softmax_match_autodiff(packed):
    """The hand-written XLA backward factorizations (_edge_bias_scatter,
    _masked_softmax — +32% train on v5e) produce the same gradients as
    plain autodiff of the two_step formulation."""
    key = jax.random.PRNGKey(5)
    ref = DenseGATBlock(hidden_dim=16, depth=2, num_heads=2, bias_impl="two_step")
    fac = DenseGATBlock(hidden_dim=16, depth=2, num_heads=2, bias_impl="factored_vjp")
    params = ref.init(key, packed)

    def loss(block):
        def f(p):
            out = block.apply(p, packed).node_feats
            w = jnp.arange(out.shape[-1], dtype=out.dtype)[None, None, :]
            return jnp.sum(jnp.sin(out) * w)
        return f

    l_ref, g_ref = jax.value_and_grad(loss(ref))(params)
    l_fac, g_fac = jax.value_and_grad(loss(fac))(params)
    np.testing.assert_allclose(float(l_fac), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_fac), jax.tree.leaves(g_ref)):
        # atol floor: the score-shift-invariant zero-grad bias leaves
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6
        )

    # _masked_softmax custom bwd vs autodiff of the same masked formula
    from notorch_tpu.nn.attention_dense import _masked_softmax

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(3, 2, 8, 8)).astype(np.float32)) * 3
    m = jnp.asarray(rng.random((3, 1, 8, 8)) < 0.6)
    m = m.at[0, 0, 2].set(False)  # one fully-masked row

    def auto(s):
        neg = jnp.where(m, s, -jnp.inf)
        mx = jnp.max(neg, axis=-1, keepdims=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        ex = jnp.where(m, jnp.exp(neg - mx), 0.0)
        return ex / jnp.maximum(ex.sum(axis=-1, keepdims=True), 1e-12)

    cot = jnp.asarray(rng.normal(size=s.shape).astype(np.float32))
    g_auto = jax.grad(lambda x: jnp.sum(auto(x) * cot))(s)
    g_cust = jax.grad(lambda x: jnp.sum(_masked_softmax(x, m) * cot))(s)
    np.testing.assert_allclose(
        np.asarray(g_cust), np.asarray(g_auto), rtol=1e-5, atol=1e-6
    )

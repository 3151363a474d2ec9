"""Round 5: ON-CHIP phase decomposition of the fused D-MPNN forward kernel
at the bench.py headline configuration (packed 72x128 bins, hidden 256,
depth 3, tile 8) — the round-4 verdict asked for measured phases instead of
the conjectured "prologue/A-build/ramp" story behind fwd at 65.8% of
roofline while train sits at 95.4%.

Variant kernels (same grid/blocking/IO as production):

  copy    — out = h (pure HBM round trip: the IO floor)
  abuild  — A built + one VPU touch, no matmuls (IO + A-build)
  chain   — all depth matmuls with a trivial constant A (IO + matmuls)
  full@d  — production kernel at depth 1 / 3 / 6 (slope = per-layer matmul
            cost, intercept = IO + A-build + launch)
"""

from __future__ import annotations

import csv
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog, _measure_chain  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from notorch_tpu.kernels.dense_mpnn import (  # noqa: E402
    _edge_adjacency,
    _read_idx,
    fused_dense_mpnn_block,
)


def _var_kernel(src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref, out_ref,
                *, depth, tile, variant):
    i = pl.program_id(0)
    h = h_ref[:]
    NB, E, d = h.shape
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, False)
    if variant == "copy":
        out_ref[:] = h
        return
    if variant == "abuild":
        A = _edge_adjacency(src, dst, emask, h.dtype)
        # one cheap use so the build cannot be dead-code-eliminated
        out_ref[:] = h + jnp.sum(A, axis=2, keepdims=True)
        return
    # chain: production matmul sequence with a trivial A (no build cost)
    A = jnp.full((NB, E, E), 0.001, h.dtype)
    for l in range(depth):
        m = jnp.maximum(h, 0.0)
        mW = jax.lax.dot_general(
            m.reshape(NB * E, d), w_ref[l], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype).reshape(NB, E, d)
        out = b_ref[l][None, None, :] + jax.lax.dot_general(
            A, mW, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = h + out
    out_ref[:] = h


def run_variant(h0, src, dst, emask, Ws, bs, variant, depth, tile=8):
    B, E, d = h0.shape
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    whole2 = pl.BlockSpec((B, E), lambda i: (0, 0))
    kernel = functools.partial(_var_kernel, depth=depth, tile=tile, variant=variant)
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[whole2, whole2, whole2,
                  pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                  whole(tuple(Ws.shape)), whole(tuple(bs.shape))],
        out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
    )(src, dst, emask, h0, Ws, bs)


def main(hidden=256):
    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    _arm_watchdog()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)

    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=6)
    dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
    ev = dembed.init(key, dbg0)
    bv = dblock.init(key, dembed.apply(ev, dbg0))
    Ws6 = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(6)])
    bs6 = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(6)])

    E_b, V_b = 128, 72
    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    G = dembed.apply(ev, pk)
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    src, dst, emask = G.src, G.dst, G.edge_mask.astype(jnp.float32)

    out = {"real_edges": real_edges, "n_bins": n_bins, "E_b": E_b, "V_b": V_b}

    def measure(fn):
        def make(chain):
            @jax.jit
            def run(h0):
                def body(_, h):
                    return fn(h)
                return jnp.sum(jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32))
            return lambda: run(h0)
        best, chain, _ = _measure_chain(make)
        return 1e6 * best / chain

    for variant, depth in [("copy", 0), ("abuild", 0), ("chain", 3)]:
        us = measure(lambda h, v=variant, dd=depth: run_variant(
            h, src, dst, emask, Ws6[:max(dd, 1)], bs6[:max(dd, 1)], v, dd))
        out[f"{variant}_us"] = round(us, 1)
        print(json.dumps({variant: out[f"{variant}_us"]}), flush=True)

    for depth in (1, 3, 6):
        us = measure(lambda h, dd=depth: fused_dense_mpnn_block(
            h, G.src, G.dst, G.edge_mask, Ws6[:dd], bs6[:dd],
            depth=dd, n_nodes=V_b, residual=True, mols_per_tile=8))
        out[f"full_d{depth}_us"] = round(us, 1)
        print(json.dumps({f"full_d{depth}": out[f"full_d{depth}_us"]}), flush=True)

    io = out["copy_us"]
    out["phase_io_us"] = round(io, 1)
    out["phase_abuild_us"] = round(out["abuild_us"] - io, 1)
    out["phase_matmuls_us"] = round(out["chain_us"] - io, 1)
    out["per_layer_us_slope"] = round((out["full_d6_us"] - out["full_d1_us"]) / 5, 1)
    out["intercept_us"] = round(out["full_d1_us"] - out["per_layer_us_slope"], 1)
    out["fwd_edges_per_sec_d3"] = round(real_edges * 3 / (out["full_d3_us"] / 1e6), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Operator-size ablation: does shrinking the [E,E] edge-to-edge operator
(the structural-sparsity direction — molecules are block-diagonal inside a
bin) buy anything?

Analysis first (round-4): per edge-lane-layer the forward costs d^2 (h@W)
+ E_b*d (A@mW) MACs. At d=256, E_b=128 the "redundant" operator is only
1/3 of forward FLOPs — Amdahl caps a perfect sparse operator at ~1.5x fwd
(~1.25x train, where the operator is 2 of 5 matmuls) — and sub-128
operators halve MXU K-utilization, which eats exactly that margin. The
round-3 density sweep shows the other direction: E_b=192 compiles but is
SLOWER in absolute edges/s (515M vs 608M) because operator FLOPs/edge grow
faster than density.

This script pins the remaining open cell: the SAME <=64-edge molecule
subset packed into E_b=64 bins vs E_b=128 bins. If the 64-operator wins,
fine-grained block-diagonal tiling has headroom; if not, the idea is
measured-closed at both ends (bigger AND smaller operators lose).
"""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog, _measure_chain  # noqa: E402


def main():
    import jax

    _arm_watchdog(3000)
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block,
        fused_dense_mpnn_block_trainable_stash,
    )
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden, depth = 256, 3
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [g for g in (pipe(s) for s in smis) if g.num_edges <= 64]
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)

    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
    dbg0 = pad_graphs_dense(graphs[:8], 48, 64)
    ev = dembed.init(key, dbg0)
    bv = dblock.init(key, dembed.apply(ev, dbg0))
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    print(json.dumps({"subset_mols": len(graphs), "real_edges": real_edges}), flush=True)

    def variant(V_b, E_b, tile):
        rec = {"V_b": V_b, "E_b": E_b, "mols_per_tile": tile}
        try:
            n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // tile) * tile
            pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
            G = dembed.apply(ev, pk)
            h0 = (
                jnp.einsum(
                    "bev,bvd->bed", G.gather_matrix(jnp.float32), G.node_feats
                )
                + G.edge_feats
            )
            rec["bins"] = n_bins
            rec["density"] = round(real_edges / (n_bins * E_b), 3)

            ref = dblock.apply(bv, G).edge_feats
            out = fused_dense_mpnn_block(
                h0, G.src, G.dst, G.edge_mask, Ws, bs,
                depth=depth, n_nodes=V_b, residual=True, mols_per_tile=tile,
            )
            mask = G.edge_mask[..., None].astype(jnp.float32)
            rel = float(jnp.abs((out - ref) * mask).max() / jnp.abs(ref * mask).max())
            rec["rel"] = round(rel, 5)
            if rel > 2e-2:
                rec["error"] = "correctness gate failed"
                return rec

            def make_fwd(chain):
                @jax.jit
                def run(Ws, bs):
                    def body(_, h):
                        return fused_dense_mpnn_block(
                            h, G.src, G.dst, G.edge_mask, Ws, bs,
                            depth=depth, n_nodes=V_b, residual=True,
                            mols_per_tile=tile,
                        )

                    return jnp.sum(
                        jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32)
                    )

                return lambda: run(Ws, bs)

            best, chain, _d = _measure_chain(make_fwd)
            rec["fwd_edges_per_sec"] = round(real_edges * depth * chain / best, 1)

            def make_train(chain):
                @jax.jit
                def run(Ws, bs):
                    def step(h, _):
                        def loss(h):
                            out = fused_dense_mpnn_block_trainable_stash(
                                h, G.src, G.dst, G.edge_mask, Ws, bs,
                                depth, V_b, True, tile, False, None,
                            )
                            return jnp.sum(out * out)

                        g = jax.grad(loss)(h)
                        return g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12), ()

                    hN, _ = jax.lax.scan(step, h0, None, length=chain)
                    return jnp.sum(hN.astype(jnp.float32))

                return lambda: run(Ws, bs)

            tbest, tchain, _t = _measure_chain(make_train)
            rec["train_edges_per_sec"] = round(real_edges * depth * tchain / tbest, 1)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:250]
        return rec

    # same molecules, two operator sizes (and a tile sweep at 64 since
    # VMEM allows more bins per tile there)
    for V_b, E_b, tile in [(40, 64, 8), (40, 64, 16), (72, 128, 8)]:
        print(json.dumps(variant(V_b, E_b, tile)), flush=True)


if __name__ == "__main__":
    main()

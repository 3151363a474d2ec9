"""Round-4 backward-strategy re-ranking on the PACKED layout.

The round-3 fold removed the VPU chain and lifted train to 95% of its HBM
roofline — which flips the round-2 conclusion that the train path is
MXU-compute-bound. Post-fold accounting per block invocation (72x128 bins,
d=256, depth 3):

  stash f32   : 9 E-tensor HBM trips (357 us)  vs 15 matmuls (238 us)  -> HBM-bound
  stash bf16  : 7 trips (277 us)               vs 15 matmuls (238 us)  -> HBM-bound, -22%
  recompute   : 5 trips (198 us)               vs 19 matmuls (301 us)  -> MXU-bound, -16%

so bf16-stash and recompute should now BEAT the f32 stash that round 2
crowned. This script measures all three (+ jnp reference) on the packed
512-mol lipo batch with a grad-parity gate first. One JSON line per row.
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog, _measure_chain  # noqa: E402


def main():
    import jax

    _arm_watchdog(3000)
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block_trainable,
        fused_dense_mpnn_block_trainable_fast,
        fused_dense_mpnn_block_trainable_stash,
    )
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden, depth, tile = 256, 3, 8
    V_b, E_b = 72, 128
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)

    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
    dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
    ev = dembed.init(key, dbg0)
    bv = dblock.init(key, dembed.apply(ev, dbg0))
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // tile) * tile
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    G = dembed.apply(ev, pk)
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats

    def stash_bf16(h, src, dst, emask, W, b, depth, V, res, t, interp, mm):
        return fused_dense_mpnn_block_trainable_stash(
            h, src, dst, emask, W, b, depth, V, res, t, interp, mm, "bfloat16"
        )

    fns = {
        "stash_f32": fused_dense_mpnn_block_trainable_stash,
        "stash_bf16": stash_bf16,
        "recompute": fused_dense_mpnn_block_trainable_fast,
        "jnp": fused_dense_mpnn_block_trainable,
    }

    # gradient parity gate on a small packed slice, highest matmul precision
    with jax.default_matmul_precision("float32"):
        tile_gate = 2  # highest-precision matmuls (3-pass f32) inflate kernel
        # VMEM ~3x; the gate runs at a small tile, timing at the production tile
        nb_small = -(-len(plan_bins(graphs[:64], V_b, E_b)) // tile_gate) * tile_gate
        small = pack_graphs_dense(graphs[:64], V_b, E_b, bin_cap=nb_small)
        Gs = dembed.apply(ev, small)
        h0s = (
            jnp.einsum("bev,bvd->bed", Gs.gather_matrix(jnp.float32), Gs.node_feats)
            + Gs.edge_feats
        )
        emask3 = Gs.edge_mask[..., None].astype(jnp.float32)

        def gradset(fn):
            def loss(h, W):
                out = fn(h, Gs.src, Gs.dst, Gs.edge_mask, W, bs,
                         depth, V_b, True, tile_gate, False, None)
                return jnp.sum((out * emask3) ** 2)

            return jax.grad(loss, argnums=(0, 1))(h0s, Ws)

        ref_g = gradset(fns["jnp"])
        for name, bar in (("stash_f32", 1e-3), ("recompute", 1e-3),
                          ("stash_bf16", 2e-2)):
            got = gradset(fns[name])
            for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got)):
                rel = float(
                    jnp.linalg.norm((a - b).ravel())
                    / (jnp.linalg.norm(a.ravel()) + 1e-9)
                )
                if rel > bar:
                    raise RuntimeError(f"grad mismatch {name}: rel_l2={rel}")
    print(json.dumps({"check": "grad_parity_packed", "ok": True}), flush=True)

    for name, fn in fns.items():
        def make_run(chain, fn=fn):
            @jax.jit
            def run(Ws, bs):
                def step(h, _):
                    def loss(h):
                        out = fn(h, G.src, G.dst, G.edge_mask, Ws, bs,
                                 depth, V_b, True, tile, False, None)
                        return jnp.sum(out * out)

                    g = jax.grad(loss)(h)
                    return g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12), ()

                hN, _ = jax.lax.scan(step, h0, None, length=chain)
                return jnp.sum(hN.astype(jnp.float32))

            return lambda: run(Ws, bs)

        try:
            best, chain, dts = _measure_chain(make_run)
            print(json.dumps({
                "backward": name,
                "train_edges_per_sec": round(real_edges * depth * chain / best, 1),
                "samples": [round(real_edges * depth * chain / d, 1) for d in dts],
            }), flush=True)
        except Exception as e:
            print(json.dumps({"backward": name,
                              "error": f"{type(e).__name__}: {e}"[:250]}),
                  flush=True)


if __name__ == "__main__":
    main()

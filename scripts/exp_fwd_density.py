"""Forward-roofline experiments (VERDICT r2 #5): can denser/bigger tiles
close the 42-46%-of-MXU-roofline gap of the packed forward kernel?

Variants over the 512-mol lipo batch (hidden 256, depth 3):
  - E_b=128 bins, mols_per_tile 8 (round-2 default) / 16
  - E_b=256 bins (density 0.978; failed Mosaic remote compile in round 2
    with an opaque HTTP 500), mols_per_tile 2 / 4 / 8
  - E_b=192 middle point, mols_per_tile 4 / 8

Each variant: pack, correctness-gate vs the jnp dense block (rel <= 2e-2 at
default bf16-multiply precision), then chain-time exactly like bench.py.
Compile failures are caught and recorded (the round-2 artifact), never
crash the sweep. Prints one JSON line per variant.
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _measure_chain, _roofline_seconds  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
    from notorch_tpu.kernels.dense_mpnn import fused_dense_mpnn_block
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden, depth = 256, 3
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)

    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
    from notorch_tpu.data.dense import pad_graphs_dense

    dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
    ev = dembed.init(key, dbg0)
    bv = dblock.init(key, dembed.apply(ev, dbg0))
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    kind = jax.devices()[0].device_kind

    def variant(V_b, E_b, tile):
        rec = {"V_b": V_b, "E_b": E_b, "mols_per_tile": tile}
        try:
            n_bins = len(plan_bins(graphs, V_b, E_b))
            n_bins = -(-n_bins // tile) * tile
            pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
            G = dembed.apply(ev, pk)
            Gm = G.gather_matrix(jnp.float32)
            h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
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

            def make_run(chain):
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

            best, chain, _dts = _measure_chain(make_run)
            rate = real_edges * depth * chain / best
            rec["fwd_edges_per_sec"] = round(rate, 1)
            prepped = [(h0, G.src, G.dst, G.edge_mask, V_b)]
            t_sol = _roofline_seconds(prepped, hidden, depth, kind)
            rec["pct_of_roofline"] = round(100.0 * t_sol / (best / chain), 1)

            # train (fwd+bwd through value_and_grad, residual-stash backward)
            # — only once the forward compiles at this shape
            from notorch_tpu.kernels.dense_mpnn import (
                fused_dense_mpnn_block_trainable_stash,
            )

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

            try:
                tbest, tchain, _t = _measure_chain(make_train)
                rec["train_edges_per_sec"] = round(
                    real_edges * depth * tchain / tbest, 1
                )
                t_sol_t = _roofline_seconds(prepped, hidden, depth, kind, train=True)
                rec["train_pct_of_roofline"] = round(
                    100.0 * t_sol_t / (tbest / tchain), 1
                )
            except Exception as e:
                rec["train_error"] = f"{type(e).__name__}: {e}"[:200]
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        return rec

    for V_b, E_b, tile in [
        (72, 128, 8),
        (72, 128, 16),
        (104, 192, 4),
        (104, 192, 8),
        (136, 256, 2),
        (136, 256, 4),
        (136, 256, 8),
    ]:
        rec = variant(V_b, E_b, tile)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

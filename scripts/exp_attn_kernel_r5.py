"""Round 5: fused Pallas attention kernel vs the jnp dense path on chip.

Shapes: 512-mol lipo batch packed into lane-aligned 128x256 bins (the
production graph-transformer configuration, BASELINE.md round 4). Reports
fwd + train edge-attention-updates/s for jnp vs fused, plus on-chip parity
of forward outputs and full-block gradients. Methodology: bench.py chains.
"""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _arm_watchdog, _measure_chain, _spread  # noqa: E402


def main(hidden=256, depth=3, heads=4, bins_per_tile=4):
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
    from notorch_tpu.nn.attention_dense import DenseGATBlock
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    _arm_watchdog()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "lipo.csv",
    )
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)

    V_b, E_b = 128, 256
    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)

    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dev = dembed.init(key, pk)
    Gp = dembed.apply(dev, pk)

    out = {
        "device": jax.devices()[0].device_kind,
        "real_edges": real_edges,
        "n_bins": n_bins,
        "V_b": V_b,
        "E_b": E_b,
        "hidden": hidden,
        "depth": depth,
        "heads": heads,
        "bins_per_tile": bins_per_tile,
    }

    blocks = {
        "jnp": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads),
        "fused": DenseGATBlock(
            hidden_dim=hidden, depth=depth, num_heads=heads,
            impl="fused", bins_per_tile=bins_per_tile,
        ),
    }
    params = blocks["jnp"].init(key, Gp)

    # ---- on-chip parity (same params) --------------------------------------
    def loss_fn(block):
        def f(p):
            o = block.apply(p, Gp).node_feats
            return jnp.sum(o * o)
        return f

    o_ref = blocks["jnp"].apply(params, Gp).node_feats
    o_fus = blocks["fused"].apply(params, Gp).node_feats
    rel = float(
        jnp.max(jnp.abs(o_fus - o_ref)) / (jnp.max(jnp.abs(o_ref)) + 1e-12)
    )
    out["fwd_parity_rel"] = rel
    l_ref, g_ref = jax.value_and_grad(loss_fn(blocks["jnp"]))(params)
    l_fus, g_fus = jax.value_and_grad(loss_fn(blocks["fused"]))(params)
    gr = jax.tree.leaves(g_ref)
    gf = jax.tree.leaves(g_fus)
    grel = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        for a, b in zip(gf, gr)
    )
    out["loss_parity_rel"] = abs(float(l_fus) - float(l_ref)) / abs(float(l_ref))
    out["grad_parity_rel"] = grel
    print(json.dumps({"parity": {k: out[k] for k in
          ("fwd_parity_rel", "loss_parity_rel", "grad_parity_rel")}}), flush=True)

    # ---- rates -------------------------------------------------------------
    for name, block in blocks.items():
        def make_fwd(chain, block=block):
            @jax.jit
            def run(bv, Gp):
                def body(_, feats):
                    return block.apply(bv, Gp.update(node_feats=feats)).node_feats
                return jnp.sum(
                    jax.lax.fori_loop(0, chain, body, Gp.node_feats).astype(jnp.float32)
                )
            return lambda: run(params, Gp)

        fbest, fchain, fdts = _measure_chain(make_fwd)
        out[f"{name}_fwd_edge_updates_per_sec"] = round(
            real_edges * depth * fchain / fbest, 1
        )
        out[f"{name}_fwd_spread_pct"] = _spread(fdts)

        def make_train(chain, block=block):
            @jax.jit
            def run(bv, Gp):
                def step(p, _):
                    def loss(pp):
                        o = block.apply(pp, Gp)
                        return jnp.sum(o.node_feats ** 2)
                    g = jax.grad(loss)(p)
                    return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), ()
                pN, _ = jax.lax.scan(step, bv, None, length=chain)
                return jnp.sum(
                    jnp.asarray(
                        [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                    )
                )
            return lambda: run(params, Gp)

        tbest, tchain, tdts = _measure_chain(make_train)
        out[f"{name}_train_edge_updates_per_sec"] = round(
            real_edges * depth * tchain / tbest, 1
        )
        out[f"{name}_train_spread_pct"] = _spread(tdts)
        print(json.dumps({k: v for k, v in out.items() if k.startswith(name)}),
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--bins-per-tile", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--heads", type=int, default=4)
    args = ap.parse_args()
    main(args.hidden, args.depth, args.heads, args.bins_per_tile)

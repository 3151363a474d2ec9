"""Dense graph-transformer TRAIN decomposition: the fwd/train ratio is 5.4x
(113.8M / 21.2M) where flops-par would be ~3x — suspect the per-edge bias
scatter's VJP. Ablation on the packed 512-mol lipo batch:

  1. full, bias_impl=einsum3 (round-4 baseline formulation)
  2. full, bias_impl=two_step (S*bias materialized, one batched matmul)
  3. edge_bias=False (no bias at all — bounds what the bias costs)

One JSON line per variant (fwd AND train)."""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog, _measure_chain  # noqa: E402


def main(hidden=256, depth=3, heads=4):
    import jax

    _arm_watchdog(3000)
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
    from notorch_tpu.nn.attention_dense import DenseGATBlock
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)

    V_b, E_b = 72, 128
    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dev = dembed.init(key, pk)
    Gp = dembed.apply(dev, pk)

    def variant(tag, **kw):
        block = DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads, **kw)
        bv = block.init(key, Gp)
        rec = {"variant": tag}

        def make_fwd(chain):
            @jax.jit
            def run(bv, Gp):
                def body(_, feats):
                    return block.apply(bv, Gp.update(node_feats=feats)).node_feats

                return jnp.sum(
                    jax.lax.fori_loop(0, chain, body, Gp.node_feats).astype(jnp.float32)
                )

            return lambda: run(bv, Gp)

        fbest, fchain, _f = _measure_chain(make_fwd)
        rec["fwd"] = round(real_edges * depth * fchain / fbest, 1)

        def make_train(chain):
            @jax.jit
            def run(bv, Gp):
                def step(params, _):
                    def loss(p):
                        o = block.apply(p, Gp)
                        return jnp.sum(o.node_feats**2)

                    g = jax.grad(loss)(params)
                    return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), ()

                pN, _ = jax.lax.scan(step, bv, None, length=chain)
                return jnp.sum(
                    jnp.asarray(
                        [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                    )
                )

            return lambda: run(bv, Gp)

        tbest, tchain, _t = _measure_chain(make_train)
        rec["train"] = round(real_edges * depth * tchain / tbest, 1)
        return rec

    for tag, kw in [
        ("einsum3", {"bias_impl": "einsum3"}),
        ("two_step", {"bias_impl": "two_step"}),
        ("no_bias", {"edge_bias": False}),
    ]:
        try:
            print(json.dumps(variant(tag, **kw)), flush=True)
        except Exception as e:
            print(json.dumps({"variant": tag,
                              "error": f"{type(e).__name__}: {e}"[:250]}), flush=True)

    # pack-shape sweep: V_b=72 lane-pads every [.., V] op to 128 (44%
    # waste); attention scales V^2 with no [E,E] operator, so lane-aligned
    # V_b=128 bins cost the same per node slot but pack denser
    for V_b2, E_b2 in [(128, 256), (128, 288)]:
        try:
            nb = -(-len(plan_bins(graphs, V_b2, E_b2)) // 8) * 8
            pk2 = pack_graphs_dense(graphs, V_b2, E_b2, bin_cap=nb)
            Gp2 = dembed.apply(dev, pk2)
            node_density = round(
                sum(g.num_nodes for g in graphs) / (nb * V_b2), 3
            )
            saved_Gp = Gp
            globals_update = None
            # re-point the closure target
            Gp_local = Gp2

            def variant2(tag, Gp_v, **kw):
                block = DenseGATBlock(hidden_dim=hidden, depth=depth,
                                      num_heads=heads, **kw)
                bv = block.init(key, Gp_v)
                rec = {"variant": tag, "bins": int(Gp_v.node_feats.shape[0]),
                       "node_density": node_density}

                def make_fwd(chain):
                    @jax.jit
                    def run(bv, Gp_v):
                        def body(_, feats):
                            return block.apply(
                                bv, Gp_v.update(node_feats=feats)
                            ).node_feats

                        return jnp.sum(
                            jax.lax.fori_loop(
                                0, chain, body, Gp_v.node_feats
                            ).astype(jnp.float32)
                        )

                    return lambda: run(bv, Gp_v)

                fbest, fchain, _f = _measure_chain(make_fwd)
                rec["fwd"] = round(real_edges * depth * fchain / fbest, 1)

                def make_train(chain):
                    @jax.jit
                    def run(bv, Gp_v):
                        def step(params, _):
                            def loss(p):
                                o = block.apply(p, Gp_v)
                                return jnp.sum(o.node_feats**2)

                            g = jax.grad(loss)(params)
                            return jax.tree.map(
                                lambda p, gg: p - 1e-9 * gg, params, g
                            ), ()

                        pN, _ = jax.lax.scan(step, bv, None, length=chain)
                        return jnp.sum(
                            jnp.asarray(
                                [jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(pN)]
                            )
                        )

                    return lambda: run(bv, Gp_v)

                tbest, tchain, _t = _measure_chain(make_train)
                rec["train"] = round(real_edges * depth * tchain / tbest, 1)
                return rec

            print(json.dumps(variant2(f"two_step_V{V_b2}xE{E_b2}", Gp_local)),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": f"V{V_b2}xE{E_b2}",
                              "error": f"{type(e).__name__}: {e}"[:250]}),
                  flush=True)


if __name__ == "__main__":
    main()

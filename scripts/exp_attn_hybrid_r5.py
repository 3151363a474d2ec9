"""Round 5 probe 2: hybrid attention (XLA fwd + Pallas recompute bwd) and
the einsum3 bias formulation, vs the round-4 jnp baseline."""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _arm_watchdog, _measure_chain  # noqa: E402


def main(hidden=256, depth=3, heads=4):
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
    from notorch_tpu.nn.attention_dense import DenseGATBlock
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    _arm_watchdog()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    n_bins = -(-len(plan_bins(graphs, 128, 256)) // 8) * 8
    pk = pack_graphs_dense(graphs, 128, 256, bin_cap=n_bins)

    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dev = dembed.init(key, pk)
    Gp = dembed.apply(dev, pk)

    variants = {
        "hybrid": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads,
                                impl="fused", bins_per_tile=4, fwd_impl="jnp"),
        "einsum3": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads,
                                 bias_impl="einsum3"),
    }
    out = {"real_edges": real_edges, "n_bins": n_bins}

    # on-chip parity of the hybrid vs jnp (forward + loss + grads)
    ref = DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads)
    params = ref.init(key, Gp)

    def lf(block):
        def f(p):
            o = block.apply(p, Gp).node_feats
            return jnp.sum(o * o)
        return f

    o_r = ref.apply(params, Gp).node_feats
    o_h = variants["hybrid"].apply(params, Gp).node_feats
    out["hybrid_fwd_rel"] = float(jnp.max(jnp.abs(o_h - o_r)) /
                                  (jnp.max(jnp.abs(o_r)) + 1e-12))
    gr = jax.tree.leaves(jax.grad(lf(ref))(params))
    gh = jax.tree.leaves(jax.grad(lf(variants["hybrid"]))(params))
    scale = max(float(jnp.max(jnp.abs(a))) for a in gr)
    out["hybrid_grad_rel_globalscale"] = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(gh, gr)
    ) / scale
    print(json.dumps({k: out[k] for k in ("hybrid_fwd_rel",
                                          "hybrid_grad_rel_globalscale")}), flush=True)

    for name, block in variants.items():
        def make_fwd(chain, block=block):
            @jax.jit
            def run(bv, Gp):
                def body(_, feats):
                    return block.apply(bv, Gp.update(node_feats=feats)).node_feats
                return jnp.sum(jax.lax.fori_loop(
                    0, chain, body, Gp.node_feats).astype(jnp.float32))
            return lambda: run(params, Gp)

        fbest, fchain, _ = _measure_chain(make_fwd)

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
                return jnp.sum(jnp.asarray(
                    [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
            return lambda: run(params, Gp)

        tbest, tchain, _ = _measure_chain(make_train)
        out[name] = {
            "fwd_us_per_iter": round(1e6 * fbest / fchain, 1),
            "train_us_per_iter": round(1e6 * tbest / tchain, 1),
            "fwd_edges_per_sec": round(real_edges * depth * fchain / fbest, 1),
            "train_edges_per_sec": round(real_edges * depth * tchain / tbest, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

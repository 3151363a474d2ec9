"""Round 5: decompose the dense graph-transformer TRAIN step cost.

Round 4 attributed ~27% of train to the bias VJP and the rest to the
unfused softmax/attention backward — but the fused attention kernel left
train UNCHANGED (27.7M both), so the bottleneck must sit elsewhere. Time
ablations on chip to locate it:

  jnp          — full jnp block (baseline)
  jnp_nobias   — edge_bias=False (kills W_bias proj + bias scatter + VJP)
  fused t4/t8  — Pallas attention core, bins_per_tile 4 / 8
  fused_nobias — Pallas core without the bias path
  ffn_only     — attention replaced by identity (residual+FFN only)
  noffn        — attention only (ffn_mult ignored, FFN removed)
"""

from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _arm_watchdog, _measure_chain  # noqa: E402

import flax.linen as nn  # noqa: E402


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
    V_b, E_b = 128, 256
    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)

    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dev = dembed.init(key, pk)
    Gp = dembed.apply(dev, pk)

    class FFNOnly(nn.Module):
        hidden_dim: int = 256
        depth: int = 3

        @nn.compact
        def __call__(self, G, training=False):
            h = nn.Dense(self.hidden_dim, name="in_proj")(G.node_feats)
            for i in range(self.depth):
                ff = nn.Dense(2 * self.hidden_dim, name=f"ffn_{i}_0")(h)
                ff = nn.Dense(self.hidden_dim, name=f"ffn_{i}_1")(nn.relu(ff))
                h = h + ff
            return G.update(node_feats=h)

    variants = {
        "jnp": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads),
        "jnp_nobias": DenseGATBlock(hidden_dim=hidden, depth=depth,
                                    num_heads=heads, edge_bias=False),
        "fused_t4": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads,
                                  impl="fused", bins_per_tile=4),
        "fused_t8": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads,
                                  impl="fused", bins_per_tile=8),
        "fused_nobias": DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads,
                                      impl="fused", bins_per_tile=4, edge_bias=False),
        "ffn_only": FFNOnly(),
    }

    out = {"real_edges": real_edges, "n_bins": n_bins}
    for name, block in variants.items():
        try:
            params = block.init(key, Gp)

            def make_fwd(chain, block=block, params=params):
                @jax.jit
                def run(bv, Gp):
                    def body(_, feats):
                        return block.apply(bv, Gp.update(node_feats=feats)).node_feats
                    return jnp.sum(jax.lax.fori_loop(
                        0, chain, body, Gp.node_feats).astype(jnp.float32))
                return lambda: run(params, Gp)

            fbest, fchain, _ = _measure_chain(make_fwd)

            def make_train(chain, block=block, params=params):
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
            row = {
                "fwd_us_per_iter": round(1e6 * fbest / fchain, 1),
                "train_us_per_iter": round(1e6 * tbest / tchain, 1),
                "fwd_edges_per_sec": round(real_edges * depth * fchain / fbest, 1),
                "train_edges_per_sec": round(real_edges * depth * tchain / tbest, 1),
            }
        except Exception as e:  # compile failure etc. — record and continue
            row = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

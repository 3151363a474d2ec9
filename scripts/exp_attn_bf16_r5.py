"""Round 5: bf16 / remat attention train probes.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json, csv
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from bench import _arm_watchdog, _measure_chain
from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
from notorch_tpu.nn.attention_dense import DenseGATBlock, DenseGraphSelfAttention
from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol
_arm_watchdog()
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data", "lipo.csv")) as f:
    smis = [row["smiles"] for row in csv.DictReader(f)][:512]
pipe = Pipeline(SmiToMol(), MolToGraph())
graphs = [pipe(s) for s in smis]
real_edges = sum(g.num_edges for g in graphs)
n_bins = -(-len(plan_bins(graphs, 128, 256)) // 8) * 8
pk = pack_graphs_dense(graphs, 128, 256, bin_cap=n_bins)
key = jax.random.PRNGKey(0)
dembed = DenseGraphEmbedding(42, 13, hidden_dim=256)
dev = dembed.init(key, pk)
Gp = dembed.apply(dev, pk)
depth = 3

class RematBlock(nn.Module):
    @nn.compact
    def __call__(self, G, training=False):
        h = nn.Dense(256, name="in_proj")(G.node_feats)
        attn_cls = nn.remat(DenseGraphSelfAttention, static_argnums=(2,))
        for i in range(depth):
            attn = attn_cls(hidden_dim=256, num_heads=4, name=f"attn_{i}")
            o = attn(G.update(node_feats=h), training).node_feats
            h = h + o
            ff = nn.Dense(512, name=f"ffn_{i}_0")(h)
            h = h + nn.Dense(256, name=f"ffn_{i}_1")(nn.relu(ff))
        return G.update(node_feats=h)

variants = {
    "bf16": DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4, dtype=jnp.bfloat16),
    "remat": RematBlock(),
}
for name, block in variants.items():
    try:
        params = block.init(key, Gp)
        def make_train(chain, block=block, params=params):
            @jax.jit
            def run(bv, Gp):
                def step(p, _):
                    def loss(pp):
                        o = block.apply(pp, Gp, training=True).node_feats
                        return jnp.sum(o.astype(jnp.float32) ** 2)
                    g = jax.grad(loss)(p)
                    return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), ()
                pN, _ = jax.lax.scan(step, bv, None, length=chain)
                return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
            return lambda: run(params, Gp)
        tbest, tchain, _ = _measure_chain(make_train)
        print(json.dumps({name: {"train_us": round(1e6*tbest/tchain,1),
                                 "train_eps": round(real_edges*depth*tchain/tbest,1)}}), flush=True)
    except Exception as e:
        print(json.dumps({name: f"{type(e).__name__}: {str(e)[:150]}"}), flush=True)

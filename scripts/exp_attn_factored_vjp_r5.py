"""Round 5: factored bias-scatter VJP train rate + grad parity.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json, csv
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
from notorch_tpu.nn.attention_dense import DenseGATBlock
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

block = DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4)  # bias_impl auto -> factored_vjp when training
ref = DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4, bias_impl="einsum3")
params = block.init(key, Gp)

# parity of factored vjp grads vs einsum3 autodiff
def lf(blk, training):
    def f(p):
        return jnp.sum(blk.apply(p, Gp, training=training).node_feats ** 2)
    return f
gr = jax.tree.leaves(jax.grad(lf(ref, True))(params))
gf = jax.tree.leaves(jax.grad(lf(block, True))(params))
scale = max(float(jnp.max(jnp.abs(a))) for a in gr)
print(json.dumps({"fvjp_grad_rel_globalscale":
    max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gr)) / scale}), flush=True)

def make_train(chain):
    @jax.jit
    def run(bv, Gp):
        def step(p, _):
            def loss(pp):
                return jnp.sum(block.apply(pp, Gp, training=True).node_feats ** 2)
            g = jax.grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), ()
        pN, _ = jax.lax.scan(step, bv, None, length=chain)
        return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
    return lambda: run(params, Gp)
tbest, tchain, dts = _measure_chain(make_train)
print(json.dumps({"fvjp_train_us": round(1e6*tbest/tchain,1),
                  "fvjp_train_eps": round(real_edges*depth*tchain/tbest,1),
                  "samples_us": [round(1e6*d/tchain,1) for d in dts]}), flush=True)

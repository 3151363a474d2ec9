"""Round 5: dense GATv2 + sdp auto-bias rates.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import csv, json
from bench import _arm_watchdog, _measure_chain
import jax, jax.numpy as jnp
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

variants = {
  "gatv2_dense": DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4, attention="gatv2"),
  "sdp_autobias": DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4),
}
out = {}
for name, block in variants.items():
    params = block.init(key, Gp)
    def make_fwd(chain, block=block, params=params):
        @jax.jit
        def run(bv, Gp):
            def body(_, feats):
                return block.apply(bv, Gp.update(node_feats=feats)).node_feats
            return jnp.sum(jax.lax.fori_loop(0, chain, body, Gp.node_feats).astype(jnp.float32))
        return lambda: run(params, Gp)
    fbest, fchain, _ = _measure_chain(make_fwd)
    def make_train(chain, block=block, params=params):
        @jax.jit
        def run(bv, Gp):
            def step(p, _):
                def loss(pp):
                    o = block.apply(pp, Gp, training=True)
                    return jnp.sum(o.node_feats ** 2)
                g = jax.grad(loss)(p)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), ()
            pN, _ = jax.lax.scan(step, bv, None, length=chain)
            return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
        return lambda: run(params, Gp)
    tbest, tchain, _ = _measure_chain(make_train)
    out[name] = {
        "fwd_us": round(1e6*fbest/fchain,1), "train_us": round(1e6*tbest/tchain,1),
        "fwd_eps": round(real_edges*depth*fchain/fbest,1),
        "train_eps": round(real_edges*depth*tchain/tbest,1)}
    print(json.dumps({name: out[name]}), flush=True)

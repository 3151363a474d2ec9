"""Round 5: head-in-grid attention kernel (v2) on-chip parity + rates.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import sys, os
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
  "hybrid_v2": DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4, impl="fused", bins_per_tile=4),
  "pallasfwd_v2": DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4, impl="fused", bins_per_tile=4, fwd_impl="pallas"),
}
ref = DenseGATBlock(hidden_dim=256, depth=depth, num_heads=4)
params = ref.init(key, Gp)

# parity of v2 on chip
def lf(block):
    def f(p):
        o = block.apply(p, Gp).node_feats
        return jnp.sum(o * o)
    return f
o_r = ref.apply(params, Gp).node_feats
for name, blk in variants.items():
    o = blk.apply(params, Gp).node_feats
    rel = float(jnp.max(jnp.abs(o - o_r)) / (jnp.max(jnp.abs(o_r)) + 1e-12))
    print(json.dumps({f"{name}_fwd_rel": rel}), flush=True)
gr = jax.tree.leaves(jax.grad(lf(ref))(params))
gh = jax.tree.leaves(jax.grad(lf(variants["hybrid_v2"]))(params))
scale = max(float(jnp.max(jnp.abs(a))) for a in gr)
print(json.dumps({"v2_grad_rel_globalscale": max(float(jnp.max(jnp.abs(a-b))) for a,b in zip(gh,gr))/scale}), flush=True)

out = {}
for name, block in variants.items():
    def make_fwd(chain, block=block):
        @jax.jit
        def run(bv, Gp):
            def body(_, feats):
                return block.apply(bv, Gp.update(node_feats=feats)).node_feats
            return jnp.sum(jax.lax.fori_loop(0, chain, body, Gp.node_feats).astype(jnp.float32))
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
            return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
        return lambda: run(params, Gp)
    tbest, tchain, _ = _measure_chain(make_train)
    out[name] = {
        "fwd_us": round(1e6*fbest/fchain,1), "train_us": round(1e6*tbest/tchain,1),
        "fwd_eps": round(real_edges*depth*fchain/fbest,1),
        "train_eps": round(real_edges*depth*tchain/tbest,1)}
    print(json.dumps({name: out[name]}), flush=True)

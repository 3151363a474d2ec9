"""Round 5: bf16 sweep (SchNet, jnp-dense D-MPNN).

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json, csv
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from bench_spatial import make_clouds
_arm_watchdog()

out = {}

# ---- SchNet f32 vs bf16 train ----------------------------------------------
from notorch_tpu.nn.spatial.schnet import SchnetBlock
P, real_atoms = make_clouds(128)
rng = np.random.default_rng(1)
N = int(P.coords.shape[0])
P = P.update(node_feats=jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32)))
K, depth = 16, 3
inter = real_atoms * K * depth
key = jax.random.PRNGKey(0)
for name, dt in (("schnet_f32", jnp.float32), ("schnet_bf16", jnp.bfloat16)):
    block = SchnetBlock(hidden_dim=128, depth=depth, radius=5.0, max_neighbors=K,
                        neighbor_window=32, dtype=dt)
    params = block.init(key, P)
    def make_train(chain, block=block, params=params):
        @jax.jit
        def run(params, P):
            def step(carry, _):
                p, coords = carry
                Pc = P.update(coords=coords)
                def loss(pp):
                    return jnp.sum(block.apply(pp, Pc).node_feats.astype(jnp.float32) ** 2)
                g = jax.grad(loss)(p)
                return (jax.tree.map(lambda a, b: a - 1e-9 * b, p, g),
                        coords + 1e-30 * jax.tree.leaves(g)[0].sum().astype(coords.dtype)), ()
            (pN, _), _ = jax.lax.scan(step, (params, P.coords), None, length=chain)
            return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
        return lambda: run(params, P)
    tbest, tchain, _ = _measure_chain(make_train)
    out[name] = round(inter * tchain / tbest, 1)
    print(json.dumps({name: out[name]}), flush=True)

# ---- jnp dense D-MPNN (dropout path) f32 vs bf16 train ----------------------
from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data", "lipo.csv")) as f:
    smis = [row["smiles"] for row in csv.DictReader(f)][:512]
pipe = Pipeline(SmiToMol(), MolToGraph())
graphs = [pipe(s) for s in smis]
real_edges = sum(g.num_edges for g in graphs)
n_bins = -(-len(plan_bins(graphs, 72, 128)) // 8) * 8
pk = pack_graphs_dense(graphs, 72, 128, bin_cap=n_bins)
dembed = DenseGraphEmbedding(42, 13, hidden_dim=256)
dev = dembed.init(key, pk)
Gp = dembed.apply(dev, pk)
for name, dt in (("dmpnn_jnp_dense_f32", jnp.float32), ("dmpnn_jnp_dense_bf16", jnp.bfloat16)):
    block = DenseChempropBlock(hidden_dim=256, depth=3, dtype=dt)
    params = block.init(key, Gp)
    def make_train(chain, block=block, params=params):
        @jax.jit
        def run(bv, Gp):
            def step(p, _):
                def loss(pp):
                    o = block.apply(pp, Gp)
                    return jnp.sum(o.edge_feats.astype(jnp.float32) ** 2)
                g = jax.grad(loss)(p)
                return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g), ()
            pN, _ = jax.lax.scan(step, bv, None, length=chain)
            return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
        return lambda: run(params, Gp)
    tbest, tchain, _ = _measure_chain(make_train)
    out[name] = round(real_edges * 3 * tchain / tbest, 1)
    print(json.dumps({name: out[name]}), flush=True)

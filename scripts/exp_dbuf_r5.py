"""Round 5: manually double-buffered D-MPNN forward vs auto-pipelined.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import csv, json
from bench import _arm_watchdog, _measure_chain
import jax, jax.numpy as jnp
import numpy as np
from notorch_tpu.kernels.dense_mpnn import fused_dense_mpnn_block, fused_dense_mpnn_block_dbuf
from notorch_tpu.data.dense import pack_graphs_dense, plan_bins, pad_graphs_dense
from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

_arm_watchdog()
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data", "lipo.csv")) as f:
    smis = [row["smiles"] for row in csv.DictReader(f)][:512]
pipe = Pipeline(SmiToMol(), MolToGraph())
graphs = [pipe(s) for s in smis]
real_edges = sum(g.num_edges for g in graphs)
key = jax.random.PRNGKey(0)
dembed = DenseGraphEmbedding(42, 13, hidden_dim=256)
dblock = DenseChempropBlock(hidden_dim=256, depth=3)
dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
ev = dembed.init(key, dbg0)
bv = dblock.init(key, dembed.apply(ev, dbg0))
Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(3)])
bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(3)])
E_b, V_b = 128, 72
n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 16) * 16
pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
G = dembed.apply(ev, pk)
Gm = G.gather_matrix(jnp.float32)
h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats

# on-chip parity first
ref = fused_dense_mpnn_block(h0, G.src, G.dst, G.edge_mask, Ws, bs, depth=3, n_nodes=V_b, mols_per_tile=8)
out = fused_dense_mpnn_block_dbuf(h0, G.src, G.dst, G.edge_mask, Ws, bs, depth=3, n_nodes=V_b, mols_per_tile=8)
mask = G.edge_mask[..., None].astype(jnp.float32)
rel = float(jnp.abs((out - ref) * mask).max() / jnp.abs(ref * mask).max())
print(json.dumps({"dbuf_parity_rel": rel}), flush=True)

def measure(fn):
    def make(chain):
        @jax.jit
        def run(h0):
            return jnp.sum(jax.lax.fori_loop(0, chain, lambda _, h: fn(h), h0).astype(jnp.float32))
        return lambda: run(h0)
    best, chain, dts = _measure_chain(make)
    return round(1e6 * best / chain, 1), [round(1e6*d/chain,1) for d in dts]

for name, fn in [
    ("auto8", lambda h: fused_dense_mpnn_block(h, G.src, G.dst, G.edge_mask, Ws, bs, depth=3, n_nodes=V_b, mols_per_tile=8)),
    ("dbuf8", lambda h: fused_dense_mpnn_block_dbuf(h, G.src, G.dst, G.edge_mask, Ws, bs, depth=3, n_nodes=V_b, mols_per_tile=8)),
    ("dbuf16", lambda h: fused_dense_mpnn_block_dbuf(h, G.src, G.dst, G.edge_mask, Ws, bs, depth=3, n_nodes=V_b, mols_per_tile=16)),
]:
    try:
        us, samples = measure(fn)
        print(json.dumps({name: us, f"{name}_eps": round(real_edges*3/(us/1e6),1), "samples": samples}), flush=True)
    except Exception as e:
        print(json.dumps({name: f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)

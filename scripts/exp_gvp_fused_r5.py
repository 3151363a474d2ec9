"""Round 5: fused GVP conv kernel end-to-end parity + rates.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from bench_spatial import make_clouds
from notorch_tpu.nn.spatial.gvp import GvpGNNBlock
_arm_watchdog()
P, real_atoms = make_clouds(128)
rng = np.random.default_rng(1)
K, depth = 16, 3
N = int(P.coords.shape[0])
print(json.dumps({"N": N, "N_mod_64": N % 64}), flush=True)
P = P.update(node_feats=jnp.asarray(rng.normal(size=(N, 64)).astype(np.float32)))
inter = real_atoms * K * depth
key = jax.random.PRNGKey(0)

jnp_blk = GvpGNNBlock(scalar_dim=64, vector_dim=8, depth=depth, radius=5.0,
                      max_neighbors=K, neighbor_window=32, impl="jnp")
fus_blk = GvpGNNBlock(scalar_dim=64, vector_dim=8, depth=depth, radius=5.0,
                      max_neighbors=K, neighbor_window=32, impl="fused")
params = jnp_blk.init(key, P)

# on-chip parity
o_ref = jnp_blk.apply(params, P).node_feats
o_fus = fus_blk.apply(params, P).node_feats
rel = float(jnp.max(jnp.abs(o_fus - o_ref)) / (jnp.max(jnp.abs(o_ref)) + 1e-12))
print(json.dumps({"fwd_parity_rel": rel}), flush=True)
def lf(blk):
    def f(p):
        return jnp.sum(blk.apply(p, P).node_feats ** 2)
    return f
gr = jax.tree.leaves(jax.grad(lf(jnp_blk))(params))
gf = jax.tree.leaves(jax.grad(lf(fus_blk))(params))
scale = max(float(jnp.max(jnp.abs(a))) for a in gr)
print(json.dumps({"grad_rel_globalscale":
    max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gr)) / scale}), flush=True)

for name, block in (("jnp", jnp_blk), ("fused", fus_blk)):
    def make_fwd(chain, block=block):
        @jax.jit
        def run(params, P):
            def body(_, carry):
                feats, coords = carry
                o = block.apply(params, P.update(node_feats=feats, coords=coords)).node_feats
                return o, coords + 1e-30 * o[:, :3]
            fN, _ = jax.lax.fori_loop(0, chain, body, (P.node_feats, P.coords))
            return jnp.sum(fN.astype(jnp.float32))
        return lambda: run(params, P)
    fbest, fchain, _ = _measure_chain(make_fwd)
    def make_train(chain, block=block):
        @jax.jit
        def run(params, P):
            def step(carry, _):
                p, coords = carry
                Pc = P.update(coords=coords)
                def loss(pp):
                    return jnp.sum(block.apply(pp, Pc).node_feats ** 2)
                g = jax.grad(loss)(p)
                return (jax.tree.map(lambda a, b: a - 1e-9 * b, p, g),
                        coords + 1e-30 * jax.tree.leaves(g)[0].sum()), ()
            (pN, _), _ = jax.lax.scan(step, (params, P.coords), None, length=chain)
            return jnp.sum(jnp.asarray([jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
        return lambda: run(params, P)
    tbest, tchain, _ = _measure_chain(make_train)
    print(json.dumps({name: {
        "fwd_us": round(1e6*fbest/fchain,1), "train_us": round(1e6*tbest/tchain,1),
        "fwd_ips": round(inter*fchain/fbest,1), "train_ips": round(inter*tchain/tbest,1)}}), flush=True)

"""Round 5: approx_min_k recall sweep + large-N scaling.

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from bench_spatial import make_clouds
_arm_watchdog()
P, real_atoms = make_clouds(128)
coords, batch_index = P.coords, P.batch_index
N = coords.shape[0]
K, r = 16, 5.0

def masked_d2(c):
    diff = c[:, None, :] - c[None, :, :]
    d2 = (diff ** 2).sum(-1)
    same = batch_index[:, None] == batch_index[None, :]
    ok = same & (d2 <= r * r) & (~jnp.eye(N, dtype=bool))
    return jnp.where(ok, d2, jnp.inf)

ref_vals, ref_pos = jax.jit(lambda c: jax.lax.top_k(-masked_d2(c), K))(coords)
ref_vals = -ref_vals

for rt in (0.999, 1.0):
    def fn(c, rt=rt):
        return jax.lax.approx_min_k(masked_d2(c), K, recall_target=rt)
    def make(chain, fn=fn):
        @jax.jit
        def run(c):
            def body(_, cc):
                v, p = fn(cc)
                return cc + 1e-30 * v[:, :1].sum()
            return jnp.sum(jax.lax.fori_loop(0, chain, body, c).astype(jnp.float32))
        return lambda: run(coords)
    try:
        best, chain, _ = _measure_chain(make)
        vals, pos = jax.jit(fn)(coords)
        diff = float(jnp.max(jnp.abs(jnp.where(jnp.isfinite(ref_vals),
            jnp.sort(vals, 1) - jnp.sort(ref_vals, 1), 0.0))))
        print(json.dumps({f"approx_rt{rt}": {"us": round(1e6*best/chain,1),
                                             "val_diff": diff}}), flush=True)
    except Exception as e:
        print(json.dumps({f"approx_rt{rt}": str(e)[:200]}), flush=True)

# larger-N scaling check (QM9-scale batches): N=8192
P2, _ = make_clouds(512)
coords2, batch2 = P2.coords, P2.batch_index
N2 = coords2.shape[0]
def masked_d2_big(c):
    diff = c[:, None, :] - c[None, :, :]
    d2 = (diff ** 2).sum(-1)
    same = batch2[:, None] == batch2[None, :]
    ok = same & (d2 <= r * r) & (~jnp.eye(N2, dtype=bool))
    return jnp.where(ok, d2, jnp.inf)
for name, f in [("topk_big", lambda c: jax.lax.top_k(-masked_d2_big(c), K)),
                ("approx1_big", lambda c: jax.lax.approx_min_k(masked_d2_big(c), K, recall_target=1.0))]:
    def make(chain, f=f):
        @jax.jit
        def run(c):
            def body(_, cc):
                v, p = f(cc)
                return cc + 1e-30 * v[:, :1].astype(cc.dtype).sum()
            return jnp.sum(jax.lax.fori_loop(0, chain, body, c).astype(jnp.float32))
        return lambda: run(coords2)
    best, chain, _ = _measure_chain(make)
    print(json.dumps({name: {"us": round(1e6*best/chain,1), "N": int(N2)}}), flush=True)

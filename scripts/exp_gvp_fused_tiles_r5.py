"""Round 5: fused GVP kernel tile sweep (isolated fwd/bwd).

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from bench_spatial import make_clouds
from notorch_tpu.nn.spatial.gvp import _norm
from notorch_tpu.nn.spatial.neighbors import radius_neighbors
from notorch_tpu.nn.rbf import RBFEmbedding
from notorch_tpu.kernels.gvp_conv import fused_gvp_conv_fwd, fused_gvp_conv_bwd, split_gvp_weights
import flax.linen as nn
from notorch_tpu.nn.spatial.gvp import GatedGVP
_arm_watchdog()
P, real_atoms = make_clouds(128)
rng = np.random.default_rng(1)
N = int(P.coords.shape[0])
ds, dv, K, W = 64, 8, 16, 32
s = jnp.asarray(rng.normal(size=(N, ds)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(N, 3, dv)).astype(np.float32))
nbrs, mask, dists = jax.jit(lambda c: radius_neighbors(c, P.batch_index, 5.0, K, window=W))(P.coords)
rbf = RBFEmbedding(0.0, 5.0, 16).apply({}, dists)
disp = P.coords[nbrs] - P.coords[:, None, :]
unit = disp / _norm(disp, axis=-1, keepdims=True)
rbf2d = rbf.reshape(N*K, -1)
ux, uy, uz = (unit[..., c].reshape(N*K, 1) for c in range(3))

class Shell(nn.Module):
    @nn.compact
    def __call__(self, si, vi):
        m = (si, vi)
        for i in range(3):
            m = GatedGVP(ds, dv, vector_act=None if i == 2 else jax.nn.sigmoid, name=f"message_{i}")(m)
        return m
sh = Shell()
params = sh.init(jax.random.PRNGKey(1),
                 jnp.zeros((4, 2*ds+16)), jnp.zeros((4, 3, 2*dv+1)))
wlist = split_gvp_weights(params["params"], ds, dv, 16)
cots = jnp.asarray(rng.normal(size=(N, ds)).astype(np.float32))
cotv = jnp.asarray(rng.normal(size=(N, dv)).astype(np.float32))

for tile in (64, 128, 256):
    def fwd_fn(sx, tile=tile):
        return fused_gvp_conv_fwd(sx, v[:,0], v[:,1], v[:,2], nbrs, mask,
                                  rbf2d, ux, uy, uz, wlist, window=W, tile=tile)[0]
    def make_f(chain, fn=fwd_fn):
        @jax.jit
        def run(x):
            def body(_, xx):
                return xx + 1e-30 * fn(xx)
            return jnp.sum(jax.lax.fori_loop(0, chain, body, x).astype(jnp.float32))
        return lambda: run(s)
    try:
        best, chain, _ = _measure_chain(make_f)
        print(json.dumps({f"fwd_tile{tile}_us": round(1e6*best/chain,1)}), flush=True)
    except Exception as e:
        print(json.dumps({f"fwd_tile{tile}": f"{type(e).__name__}: {str(e)[:120]}"}), flush=True)

for tile in (16, 32):
    def bwd_fn(sx, tile=tile):
        return fused_gvp_conv_bwd(sx, v[:,0], v[:,1], v[:,2], nbrs, mask,
                                  rbf2d, ux, uy, uz, wlist,
                                  cots, cotv, cotv, cotv, window=W, tile=tile)[0]
    def make_b(chain, fn=bwd_fn):
        @jax.jit
        def run(x):
            def body(_, xx):
                return xx + 1e-30 * fn(xx)
            return jnp.sum(jax.lax.fori_loop(0, chain, body, x).astype(jnp.float32))
        return lambda: run(s)
    try:
        best, chain, _ = _measure_chain(make_b)
        print(json.dumps({f"bwd_tile{tile}_us": round(1e6*best/chain,1)}), flush=True)
    except Exception as e:
        print(json.dumps({f"bwd_tile{tile}": f"{type(e).__name__}: {str(e)[:120]}"}), flush=True)

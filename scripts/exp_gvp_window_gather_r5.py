"""Round 5: windowed gather formulations (take_along_axis / one-hot).

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from bench_spatial import make_clouds
from notorch_tpu.nn.spatial.neighbors import radius_neighbors
_arm_watchdog()
P, real_atoms = make_clouds(128)
rng = np.random.default_rng(1)
N = int(P.coords.shape[0])
ds, dv, K, W = 64, 8, 16, 32
s = jnp.asarray(rng.normal(size=(N, ds)).astype(np.float32))
nbrs, mask, dists = jax.jit(lambda c: radius_neighbors(c, P.batch_index, 5.0, K, window=W))(P.coords)
rel_idx = jnp.clip(nbrs - (jnp.arange(N)[:, None] - W), 0, 2 * W)

def win_stack(x):
    pad = jnp.zeros((W,) + x.shape[1:], x.dtype)
    xp = jnp.concatenate([pad, x, pad], 0)
    return jnp.stack([xp[k:k+N] for k in range(2*W+1)], axis=1)  # [N, 2W+1, ...]

def g_plain(x):
    return x[nbrs]

def g_tala(x):
    xw = win_stack(x)
    idx = rel_idx.reshape(N, K, *([1]*(x.ndim-1)))
    return jnp.take_along_axis(xw, jnp.broadcast_to(idx, (N, K) + x.shape[1:]), axis=1)

def g_onehot(x):
    xw = win_stack(x)  # [N, 65, ds]
    oh = (rel_idx[:, :, None] == jnp.arange(2*W+1)[None, None, :]).astype(x.dtype)  # [N,K,65]
    flat = xw.reshape(N, 2*W+1, -1)
    out = jnp.einsum("nke,ned->nkd", oh, flat)
    return out.reshape((N, K) + x.shape[1:])

# parity
ref = jax.jit(g_plain)(s)
for name, fn in [("tala", g_tala), ("onehot", g_onehot)]:
    got = jax.jit(fn)(s)
    d = float(jnp.max(jnp.abs(jnp.where(mask[..., None], got - ref, 0.0))))
    print(json.dumps({f"{name}_parity_maxdiff": d}), flush=True)

cot = jax.random.normal(jax.random.PRNGKey(1), (N, K, ds))
for name, fn in [("plain", g_plain), ("tala", g_tala), ("onehot", g_onehot)]:
    def make_f(chain, fn=fn):
        @jax.jit
        def run(x):
            def body(_, xx):
                o = fn(xx)
                return xx + 1e-30 * o[:, 0, :1].sum()
            return jnp.sum(jax.lax.fori_loop(0, chain, body, x).astype(jnp.float32))
        return lambda: run(s)
    best, chain, _ = _measure_chain(make_f)
    def make_b(chain, fn=fn):
        @jax.jit
        def run(x):
            def body(_, xx):
                g = jax.grad(lambda a: jnp.sum(fn(a) * cot))(xx)
                return xx + 1e-9 * g
            return jnp.sum(jax.lax.fori_loop(0, chain, body, x).astype(jnp.float32))
        return lambda: run(s)
    bbest, bchain, _ = _measure_chain(make_b)
    print(json.dumps({name: {"fwd_us": round(1e6*best/chain,1),
                             "fwdbwd_us": round(1e6*bbest/bchain,1)}}), flush=True)

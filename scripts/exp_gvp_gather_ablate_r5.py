"""Round 5: GVP conv gather/edge-feature ablations (gathers ~55% of train).

Backs the corresponding BASELINE.md round-5 rows; bench.py chain protocol.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import flax.linen as nn
import numpy as np, jax, jax.numpy as jnp
from bench import _arm_watchdog, _measure_chain
from bench_spatial import make_clouds
from notorch_tpu.nn.spatial.gvp import (
    GatedGVP, DualRankDropout, DualRankLayerNorm, _nbr_take, _norm)
from notorch_tpu.nn.spatial.neighbors import radius_neighbors
from notorch_tpu.nn.rbf import RBFEmbedding
_arm_watchdog()
P, real_atoms = make_clouds(128)
rng = np.random.default_rng(1)
ds, dv, K, depth = 64, 8, 16, 3
P = P.update(node_feats=jnp.asarray(rng.normal(size=(P.num_nodes, ds)).astype(np.float32)))
inter = real_atoms * K * depth

class Conv(nn.Module):
    gather: str = "take"      # take | roll
    edgefeat: str = "real"    # real | const
    @nn.compact
    def __call__(self, sv, P, training=False, neighbors=None):
        s, v = sv
        nbrs, mask, dists = neighbors
        N = s.shape[0]
        if self.edgefeat == "real":
            rbf = RBFEmbedding(0.0, 5.0, 16)(dists)
            disp = P.coords[nbrs] - P.coords[:, None, :]
            unit = disp / _norm(disp, axis=-1, keepdims=True)
        else:
            rbf = jnp.ones((N, K, 16), s.dtype)
            unit = jnp.ones((N, K, 3), s.dtype)
        if self.gather == "take":
            s_j = _nbr_take(s, nbrs); v_j = _nbr_take(v, nbrs)
        else:
            s_j = jnp.broadcast_to(jnp.roll(s, 1, 0)[:, None], (N, K, s.shape[-1]))
            v_j = jnp.broadcast_to(jnp.roll(v, 1, 0)[:, None], (N, K) + v.shape[1:])
        s_in = jnp.concatenate([jnp.broadcast_to(s[:, None], s_j.shape), s_j, rbf], -1)
        v_in = jnp.concatenate([jnp.broadcast_to(v[:, None], v_j.shape), v_j, unit[..., None]], -1)
        msg = (s_in, v_in)
        for i in range(3):
            msg = GatedGVP(ds, dv, vector_act=None if i == 2 else jax.nn.sigmoid,
                           name=f"message_{i}")(msg, training=training)
        ms, mv = msg
        fmask = mask[..., None].astype(ms.dtype)
        denom = jnp.maximum(mask.sum(1), 1)[:, None].astype(ms.dtype)
        agg_s = (ms * fmask).sum(1) / denom
        agg_v = (mv * fmask[..., None, :]).sum(1) / denom[..., None]
        return DualRankLayerNorm(name="ln")((s + agg_s, v + agg_v))

class Block(nn.Module):
    gather: str = "take"
    edgefeat: str = "real"
    @nn.compact
    def __call__(self, P, training=False):
        s = nn.Dense(ds, name="in_proj")(P.node_feats)
        v = jnp.zeros(s.shape[:-1] + (3, dv), s.dtype)
        nb = radius_neighbors(P.coords, P.batch_index, 5.0, K, window=32)
        sv = (s, v)
        for i in range(depth):
            sv = Conv(self.gather, self.edgefeat, name=f"conv_{i}")(sv, P, training, nb)
            upd = sv
            for u in range(2):
                upd = GatedGVP(ds, dv, name=f"upd_{i}_{u}")(upd, training)
            sv = DualRankLayerNorm(name=f"ln_{i}")((sv[0] + upd[0], sv[1] + upd[1]))
        return P.update(node_feats=sv[0])

key = jax.random.PRNGKey(0)
for name, blk in {
    "win_full": Block(),
    "win_roll": Block(gather="roll"),
    "win_constedge": Block(edgefeat="const"),
    "win_roll_constedge": Block(gather="roll", edgefeat="const"),
}.items():
    params = blk.init(key, P)
    def make_fwd(chain, blk=blk, params=params):
        @jax.jit
        def run(params, P):
            def body(_, carry):
                feats, coords = carry
                o = blk.apply(params, P.update(node_feats=feats, coords=coords)).node_feats
                return o, coords + 1e-30 * o[:, :3]
            fN, _ = jax.lax.fori_loop(0, chain, body, (P.node_feats, P.coords))
            return jnp.sum(fN.astype(jnp.float32))
        return lambda: run(params, P)
    fbest, fchain, _ = _measure_chain(make_fwd)
    def make_train(chain, blk=blk, params=params):
        @jax.jit
        def run(params, P):
            def step(carry, _):
                p, coords = carry
                Pc = P.update(coords=coords)
                def loss(pp):
                    return jnp.sum(blk.apply(pp, Pc).node_feats ** 2)
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

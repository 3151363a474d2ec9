"""Round 5: decompose the GVP train step (judge item r4#7 — train 30.6M vs
fwd 61.5M interactions/s after the round-4 gather fix).

Ablations on the bench_gvp configuration (128 mols, ds=64, dv=8, K=16,
depth 3): message-GVP count, update-GVP count, conv-only. Methodology as
bench_spatial (coords coupled into the chain so the neighbor build is
counted; same interactions/s metric)."""

from __future__ import annotations

import json
import os
import sys

import flax.linen as nn
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import _arm_watchdog, _measure_chain  # noqa: E402
from bench_spatial import make_clouds  # noqa: E402


def main(n_mols=128, ds=64, dv=8, depth=3, K=16):
    import jax
    import jax.numpy as jnp

    from notorch_tpu.nn.spatial.gvp import (
        DualRankLayerNorm,
        GatedGVP,
        GvpConv,
    )

    _arm_watchdog()
    P, real_atoms = make_clouds(n_mols)
    rng = np.random.default_rng(1)
    P = P.update(
        node_feats=jnp.asarray(rng.normal(size=(P.num_nodes, ds)).astype(np.float32))
    )
    key = jax.random.PRNGKey(0)
    inter = real_atoms * K * depth

    class Block(nn.Module):
        n_msg: int = 3
        n_upd: int = 2
        use_conv: bool = True

        @nn.compact
        def __call__(self, P, training=False):
            s = nn.Dense(ds, name="in_proj")(P.node_feats)
            v = jnp.zeros(s.shape[:-1] + (3, dv), s.dtype)
            sv = (s, v)
            for i in range(depth):
                if self.use_conv:
                    sv = GvpConv(
                        ds, dv, 5.0, K, num_message_gvps=self.n_msg,
                        name=f"conv_{i}",
                    )(sv, P, training=training)
                s2, v2 = sv
                upd = sv
                for u in range(self.n_upd):
                    upd = GatedGVP(ds, dv, name=f"upd_{i}_{u}")(upd, training)
                if self.n_upd:
                    sv = DualRankLayerNorm(name=f"ln_{i}")(
                        (s2 + upd[0], v2 + upd[1])
                    )
            return P.update(node_feats=sv[0])

    variants = {
        "full": Block(),
        "msg1": Block(n_msg=1),
        "upd0": Block(n_upd=0),
        "noconv": Block(use_conv=False),
    }
    out = {"n_nodes": int(P.num_nodes), "real_atoms": real_atoms}
    for name, block in variants.items():
        params = block.init(key, P)

        def make_fwd(chain, block=block, params=params):
            @jax.jit
            def run(params, P):
                def body(_, carry):
                    feats, coords = carry
                    o = block.apply(
                        params, P.update(node_feats=feats, coords=coords)
                    ).node_feats
                    return o, coords + 1e-30 * o[:, :3]
                fN, _ = jax.lax.fori_loop(0, chain, body, (P.node_feats, P.coords))
                return jnp.sum(fN.astype(jnp.float32))
            return lambda: run(params, P)

        fbest, fchain, _ = _measure_chain(make_fwd)

        def make_train(chain, block=block, params=params):
            @jax.jit
            def run(params, P):
                def step(carry, _):
                    p, coords = carry
                    Pc = P.update(coords=coords)
                    def loss(pp):
                        return jnp.sum(block.apply(pp, Pc).node_feats ** 2)
                    g = jax.grad(loss)(p)
                    new = jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)
                    return (new, coords + 1e-30 * jax.tree.leaves(g)[0].sum()), ()
                (pN, _), _ = jax.lax.scan(step, (params, P.coords), None, length=chain)
                return jnp.sum(jnp.asarray(
                    [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]))
            return lambda: run(params, P)

        tbest, tchain, _ = _measure_chain(make_train)
        out[name] = {
            "fwd_us": round(1e6 * fbest / fchain, 1),
            "train_us": round(1e6 * tbest / tchain, 1),
            "fwd_ips": round(inter * fchain / fbest, 1),
            "train_ips": round(inter * tchain / tbest, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

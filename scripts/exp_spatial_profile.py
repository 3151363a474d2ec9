"""Where does the SchNet forward go? Split the block cost into the O(N^2)
static-K neighbor build (one masked [N, N] distance matrix + top_k) vs the
per-layer CFConv math (filter MLP on RBFs + gather + masked K-reduce).

If the neighbor build dominates, a dense PER-MOLECULE neighbor path
([B, V_m, V_m] block distances — ~V/N_cap of the flat N^2 work) is the next
optimization; this script decides that with numbers.
"""

from __future__ import annotations

import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_spatial import make_clouds, measure  # noqa: E402


def _arm_watchdog(seconds: int = 2400) -> None:
    import threading

    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def main():
    import jax
    import jax.numpy as jnp

    _arm_watchdog()

    from notorch_tpu.nn.spatial.neighbors import radius_neighbors
    from notorch_tpu.nn.spatial.pointwise import PointwiseEmbed
    from notorch_tpu.nn.spatial.schnet import SchnetBlock

    hidden, depth, K, radius = 128, 3, 16, 5.0
    P, real_atoms = make_clouds(128)
    embed = PointwiseEmbed(num_types=16, hidden_dim=hidden)
    block = SchnetBlock(hidden_dim=hidden, depth=depth, radius=radius, max_neighbors=K)
    key = jax.random.PRNGKey(0)
    ev = embed.init(key, P)
    P1 = embed.apply(ev, P)
    bv = block.init(key, P1)

    out = {"device": jax.devices()[0].device_kind, "real_atoms": real_atoms,
           "node_cap": int(P.num_nodes)}

    # (a) neighbor build alone, chained (coords perturbed per iter so the
    # loop isn't constant-folded)
    def make_nbrs(chain):
        @jax.jit
        def run(coords):
            def body(i, c):
                nbrs, mask, dists = radius_neighbors(
                    c, P1.batch_index, radius, K
                )
                return c + 1e-12 * dists.sum() + 1e-12 * nbrs.sum()

            return jnp.sum(jax.lax.fori_loop(0, chain, body, coords))

        return lambda: run(P1.coords)

    nbest, nchain = measure(make_nbrs)
    out["neighbor_build_ms"] = round(1e3 * nbest / nchain, 3)

    # (b) full block, chained on node_feats (neighbors recomputed inside —
    # XLA CSE collapses the per-layer duplicates to one build per iter)
    def make_block(chain):
        @jax.jit
        def run(bv, P1):
            def body(_, feats):
                return block.apply(bv, P1.update(node_feats=feats)).node_feats

            return jnp.sum(
                jax.lax.fori_loop(0, chain, body, P1.node_feats).astype(jnp.float32)
            )

        return lambda: run(bv, P1)

    bbest, bchain = measure(make_block)
    out["block_fwd_ms"] = round(1e3 * bbest / bchain, 3)

    # (c) block with the neighbor build HOISTED out of the chain: pass
    # precomputed (nbrs, mask, dists) through a CFConv-equivalent inline
    nbrs, mask, dists = radius_neighbors(P1.coords, P1.batch_index, radius, K)

    from notorch_tpu.nn.rbf import RBFEmbedding

    rbf = RBFEmbedding(0.0, radius, 16).apply({}, dists)  # [N, K, nb] static

    p = bv["params"]

    def layer_math(feats, lp):
        h = feats @ lp["in_proj"]["kernel"] + lp["in_proj"]["bias"]
        W = rbf @ lp["cfconv"]["filter_0"]["kernel"] + lp["cfconv"]["filter_0"]["bias"]
        W = jnp.logaddexp(W, 0.0) - jnp.log(2.0)
        W = W @ lp["cfconv"]["filter_1"]["kernel"] + lp["cfconv"]["filter_1"]["bias"]
        W = jnp.logaddexp(W, 0.0) - jnp.log(2.0)
        nb = h[nbrs]
        h = (W * nb * mask[..., None].astype(h.dtype)).sum(axis=1)
        h = h @ lp["out_proj_0"]["kernel"] + lp["out_proj_0"]["bias"]
        h = jnp.logaddexp(h, 0.0) - jnp.log(2.0)
        h = h @ lp["out_proj_1"]["kernel"] + lp["out_proj_1"]["bias"]
        return feats + h

    def make_hoisted(chain):
        @jax.jit
        def run(p, feats):
            def body(_, f):
                for i in range(depth):
                    f = layer_math(f, p[f"interaction_{i}"])
                return f

            return jnp.sum(
                jax.lax.fori_loop(0, chain, body, feats).astype(jnp.float32)
            )

        return lambda: run(p, P1.node_feats)

    hbest, hchain = measure(make_hoisted)
    out["hoisted_layers_ms"] = round(1e3 * hbest / hchain, 3)
    out["implied_neighbor_share_pct"] = round(
        100.0 * (1.0 - out["hoisted_layers_ms"] / out["block_fwd_ms"]), 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Graph-attention stack on the chip: GATv2 + edge-biased SDP forward and
train rates (the round-3 verdict's missing attention perf row).

Shapes: the 512-mol lipo batch (flat layout — the attention layers are
segment-softmax/segment-sum shaped). Metric: edge-attention updates/s =
real_edges x depth x chain / t. Methodology follows bench.py: on-device
``fori_loop``/``scan`` chains >= 1 s, scalar fetch to sync (the tunnel's
latency floor + early-returning block_until_ready make per-call timing
meaningless)."""

from __future__ import annotations

import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arm_watchdog(seconds: int = 2400) -> None:
    """LAST-RESORT timer for a hung remote compile (holds no queued device
    work); sized runs should always finish on their own."""
    import threading

    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


from bench import _measure_chain  # noqa: E402  (shared best-of-N protocol)


def measure(run_scalar, target_seconds: float = 1.2):
    best, chain, _dts = _measure_chain(run_scalar, target_seconds)
    return best, chain


def main(hidden=256, depth=3, heads=4):
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.nn.attention import GATBlock
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    _arm_watchdog()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "lipo.csv",
    )
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    total_v = sum(g.num_nodes for g in graphs) + 1
    v_cap = -(-total_v // 1024) * 1024
    e_cap = -(-real_edges // 2048) * 2048
    bg = pad_graphs(graphs, v_cap, e_cap, graph_cap=len(graphs))

    key = jax.random.PRNGKey(0)
    embed = GraphEmbedding(hidden_dim=hidden)
    ev = embed.init(key, bg)
    G = embed.apply(ev, bg)

    out = {
        "device": jax.devices()[0].device_kind,
        "real_edges": real_edges,
        "hidden": hidden,
        "depth": depth,
        "heads": heads,
    }
    for attn in ("gatv2", "sdp"):
        block = GATBlock(hidden_dim=hidden, depth=depth, num_heads=heads, attention=attn)
        bv = block.init(key, G)

        def make_fwd(chain):
            @jax.jit
            def run(bv, G):
                def body(_, feats):
                    return block.apply(bv, G.update(node_feats=feats)).node_feats

                return jnp.sum(
                    jax.lax.fori_loop(0, chain, body, G.node_feats).astype(jnp.float32)
                )

            return lambda: run(bv, G)

        fbest, fchain = measure(make_fwd)

        def make_train(chain):
            @jax.jit
            def run(bv, G):
                def step(params, _):
                    def loss(p):
                        o = block.apply(p, G)
                        return jnp.sum(o.node_feats**2)

                    g = jax.grad(loss)(params)
                    return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), ()

                pN, _ = jax.lax.scan(step, bv, None, length=chain)
                return jnp.sum(
                    jnp.asarray(
                        [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                    )
                )

            return lambda: run(bv, G)

        tbest, tchain = measure(make_train)
        out[f"{attn}_fwd_edge_updates_per_sec"] = round(
            real_edges * depth * fchain / fbest, 1
        )
        out[f"{attn}_train_edge_updates_per_sec"] = round(
            real_edges * depth * tchain / tbest, 1
        )

    # dense-packed graph-transformer: the layer is batched MXU matmuls over
    # packed bins (adjacency from S@G) instead of segment ops
    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins
    from notorch_tpu.nn.attention_dense import DenseGATBlock
    from notorch_tpu.nn.chemprop_dense import DenseGraphEmbedding

    # lane-aligned production bins (gat_loader_kwargs; +32% fwd vs the 72
    # default heuristic — BASELINE.md round 4)
    V_b, E_b = 128, 256
    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dev = dembed.init(key, pk)
    Gp = dembed.apply(dev, pk)
    dblock = DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads)
    dbv = dblock.init(key, Gp)

    # dense GATv2 (round 5: edge-space scores + one-contraction scatter)
    gblock = DenseGATBlock(hidden_dim=hidden, depth=depth, num_heads=heads,
                           attention="gatv2")
    gbv = gblock.init(key, Gp)

    def make_gv2_fwd(chain):
        @jax.jit
        def run(bv, Gp):
            def body(_, feats):
                return gblock.apply(bv, Gp.update(node_feats=feats)).node_feats
            return jnp.sum(
                jax.lax.fori_loop(0, chain, body, Gp.node_feats).astype(jnp.float32)
            )
        return lambda: run(gbv, Gp)

    fb, fc = measure(make_gv2_fwd)

    def make_gv2_train(chain):
        @jax.jit
        def run(bv, Gp):
            def step(params, _):
                def loss(p):
                    o = gblock.apply(p, Gp, training=True)
                    return jnp.sum(o.node_feats**2)
                g = jax.grad(loss)(params)
                return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), ()
            pN, _ = jax.lax.scan(step, bv, None, length=chain)
            return jnp.sum(jnp.asarray(
                [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
            ))
        return lambda: run(gbv, Gp)

    tb, tc = measure(make_gv2_train)
    out["dense_gatv2_fwd_edge_updates_per_sec"] = round(real_edges * depth * fc / fb, 1)
    out["dense_gatv2_train_edge_updates_per_sec"] = round(real_edges * depth * tc / tb, 1)

    def make_dense_fwd(chain):
        @jax.jit
        def run(bv, Gp):
            def body(_, feats):
                return dblock.apply(bv, Gp.update(node_feats=feats)).node_feats

            return jnp.sum(
                jax.lax.fori_loop(0, chain, body, Gp.node_feats).astype(jnp.float32)
            )

        return lambda: run(dbv, Gp)

    fbest, fchain = measure(make_dense_fwd)

    def make_dense_train(chain):
        @jax.jit
        def run(bv, Gp):
            def step(params, _):
                def loss(p):
                    o = dblock.apply(p, Gp)
                    return jnp.sum(o.node_feats**2)

                g = jax.grad(loss)(params)
                return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g), ()

            pN, _ = jax.lax.scan(step, bv, None, length=chain)
            return jnp.sum(
                jnp.asarray(
                    [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(pN)]
                )
            )

        return lambda: run(dbv, Gp)

    tbest, tchain = measure(make_dense_train)
    out["dense_sdp_fwd_edge_updates_per_sec"] = round(
        real_edges * depth * fchain / fbest, 1
    )
    out["dense_sdp_train_edge_updates_per_sec"] = round(
        real_edges * depth * tchain / tbest, 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""TPU experiment round 2: f32 timing (corrected gate), full-bf16 state,
tile=4, and size-sorted sub-batch aggregate. One JSON line per variant."""

from __future__ import annotations

import csv
import json
import os
import threading
import time


def _arm_watchdog(seconds: int = 3000) -> None:
    def die():
        print(f"watchdog: no completion within {seconds}s; aborting", flush=True)
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def main() -> None:
    _arm_watchdog()
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block,
        fused_dense_mpnn_block_trainable_fast,
    )
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    print("devices:", jax.devices(), flush=True)

    hidden, depth = 256, 3
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    max_v = max(g.num_nodes for g in graphs)
    max_e = max(g.num_edges for g in graphs)
    V_m = -(-(max_v + 1) // 8) * 8
    E_m = -(-max_e // 16) * 16

    dbg = pad_graphs_dense(graphs, V_m, E_m)
    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
    ev = dembed.init(key, dbg)
    G = dembed.apply(ev, dbg)
    bv = dblock.init(key, G)
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    ref = dblock.apply(bv, G).edge_feats
    ref_scale = float(jnp.abs(ref).max())

    def measure(run_scalar, target_seconds=1.5):
        probe = run_scalar(10)
        float(probe())
        t0 = time.perf_counter()
        float(probe())
        dt10 = time.perf_counter() - t0
        chain = max(20, min(3000, int(target_seconds / max(dt10 / 10, 1e-5))))
        run = run_scalar(chain)
        float(run())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        return best, chain

    # ---- single-batch forward variants -----------------------------------
    def fwd_variant(name, h, W, b, tile, mm, tol):
        try:
            out = fused_dense_mpnn_block(
                h, G.src, G.dst, G.edge_mask, W, b,
                depth=depth, n_nodes=V_m, residual=True, mols_per_tile=tile,
                matmul_dtype=mm,
            )
            rel = float(jnp.abs(out.astype(jnp.float32) - ref).max()) / ref_scale
            if rel > tol:
                raise RuntimeError(f"mismatch rel={rel}")

            def make_run(chain):
                @jax.jit
                def run(h, src, dst, emask, W, b):
                    def body(_, x):
                        return fused_dense_mpnn_block(
                            x, src, dst, emask, W, b,
                            depth=depth, n_nodes=V_m, residual=True,
                            mols_per_tile=tile, matmul_dtype=mm,
                        )
                    return jnp.sum(
                        jax.lax.fori_loop(0, chain, body, h).astype(jnp.float32)
                    )

                return lambda: run(h, G.src, G.dst, G.edge_mask, W, b)

            best, chain = measure(make_run)
            eps = real_edges * depth * chain / best
            print(json.dumps({"name": name, "edges_per_sec": round(eps), "rel": rel}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": repr(e)[:250]}), flush=True)

    fwd_variant("fwd_f32_tile8", h0, Ws, bs, 8, None, 0.02)
    fwd_variant("fwd_bf16mm_tile4", h0, Ws, bs, 4, "bfloat16", 0.02)
    bf = jnp.bfloat16
    fwd_variant(
        "fwd_allbf16_tile8", h0.astype(bf), Ws.astype(bf), bs.astype(bf), 8, None, 0.05
    )

    # ---- size-sorted sub-batch aggregate ---------------------------------
    try:
        order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)
        n_groups = 4
        gs = len(graphs) // n_groups
        groups = [[graphs[i] for i in order[k * gs : (k + 1) * gs]] for k in range(n_groups)]
        prepped = []
        for grp in groups:
            mv = max(g.num_nodes for g in grp)
            me = max(g.num_edges for g in grp)
            Vg = -(-(mv + 1) // 8) * 8
            Eg = -(-me // 16) * 16
            dbg_g = pad_graphs_dense(grp, Vg, Eg)
            Gg = dembed.apply(ev, dbg_g)
            Gmg = Gg.gather_matrix(jnp.float32)
            h0g = jnp.einsum("bev,bvd->bed", Gmg, Gg.node_feats) + Gg.edge_feats
            prepped.append((h0g, Gg.src, Gg.dst, Gg.edge_mask, Vg, Eg))
        print(json.dumps({"group_caps": [(p[4], p[5]) for p in prepped]}), flush=True)

        def make_run(chain):
            @jax.jit
            def run(prepped, Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for h0g, src, dst, emask, Vg, _ in prepped:
                    def body(_, x, src=src, dst=dst, emask=emask, Vg=Vg):
                        return fused_dense_mpnn_block(
                            x, src, dst, emask, Ws, bs,
                            depth=depth, n_nodes=Vg, residual=True,
                            mols_per_tile=8, matmul_dtype="bfloat16",
                        )
                    acc += jnp.sum(
                        jax.lax.fori_loop(0, chain, body, h0g).astype(jnp.float32)
                    )
                return acc

            return lambda: run(prepped, Ws, bs)

        best, chain = measure(make_run)
        eps = real_edges * depth * chain / best
        print(json.dumps({"name": "fwd_sorted4_bf16mm_tile8", "edges_per_sec": round(eps)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": "fwd_sorted4_bf16mm_tile8", "error": repr(e)[:250]}),
              flush=True)

    # ---- fwd+bwd tile=4 ---------------------------------------------------
    try:
        def make_run(chain):
            @jax.jit
            def run(h0, src, dst, emask, Ws, bs):
                def step(h, _):
                    def loss(h):
                        out = fused_dense_mpnn_block_trainable_fast(
                            h, src, dst, emask, Ws, bs, depth, V_m, True, 4, False,
                            "bfloat16",
                        )
                        return jnp.sum(out * h0)

                    g = jax.grad(loss)(h)
                    h = g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12)
                    return h, ()

                hN, _ = jax.lax.scan(step, h0, None, length=chain)
                return jnp.sum(hN.astype(jnp.float32))

            return lambda: run(h0, G.src, G.dst, G.edge_mask, Ws, bs)

        best, chain = measure(make_run)
        eps = real_edges * depth * chain / best
        print(json.dumps({"name": "fwdbwd_bf16mm_tile4", "edges_per_sec": round(eps)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": "fwdbwd_bf16mm_tile4", "error": repr(e)[:250]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

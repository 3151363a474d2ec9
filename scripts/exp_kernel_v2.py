"""TPU experiment: fused-kernel v2 (edge-to-edge A-matrix formulation).

Measures edges/sec for the reworked kernel across {f32, bf16-operand} x
{tile 8, 16}, forward-only and fwd+bwd, on the real chip. One JSON line per
variant. Sized to run to completion (never kill a TPU-attached process).

Run:  python scripts/exp_kernel_v2.py > /tmp/exp_kernel_v2.out 2>&1
"""

from __future__ import annotations

import csv
import json
import os
import sys
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
    import numpy as np

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
    print(f"real_edges={real_edges} V_m={V_m} E_m={E_m}", flush=True)

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

    results = []

    # ---- forward-only variants -------------------------------------------
    for mm, tile in [(None, 8), (None, 16), ("bfloat16", 8), ("bfloat16", 16)]:
        name = f"fwd_mm={mm or 'f32'}_tile={tile}"
        try:
            out = fused_dense_mpnn_block(
                h0, G.src, G.dst, G.edge_mask, Ws, bs,
                depth=depth, n_nodes=V_m, residual=True, mols_per_tile=tile,
                matmul_dtype=mm,
            )
            rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
            tol = 1e-5 if mm is None else 0.05
            if rel > tol:
                raise RuntimeError(f"mismatch rel={rel}")

            def make_run(chain, tile=tile, mm=mm):
                @jax.jit
                def run(h0, src, dst, emask, Ws, bs):
                    def body(_, h):
                        return fused_dense_mpnn_block(
                            h, src, dst, emask, Ws, bs,
                            depth=depth, n_nodes=V_m, residual=True,
                            mols_per_tile=tile, matmul_dtype=mm,
                        )
                    return jnp.sum(
                        jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32)
                    )

                return lambda: run(h0, G.src, G.dst, G.edge_mask, Ws, bs)

            best, chain = measure(make_run)
            eps = real_edges * depth * chain / best
            results.append({"name": name, "edges_per_sec": round(eps), "rel_err": rel})
            print(json.dumps(results[-1]), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": repr(e)[:300]}), flush=True)

    # ---- fwd+bwd variants -------------------------------------------------
    for mm, tile in [(None, 8), ("bfloat16", 8), ("bfloat16", 16)]:
        name = f"fwdbwd_mm={mm or 'f32'}_tile={tile}"
        try:
            def make_run(chain, tile=tile, mm=mm):
                @jax.jit
                def run(h0, src, dst, emask, Ws, bs):
                    def step(h, _):
                        def loss(h):
                            out = fused_dense_mpnn_block_trainable_fast(
                                h, src, dst, emask, Ws, bs,
                                depth, V_m, True, tile, False, mm,
                            )
                            return jnp.sum(out * h0)

                        g = jax.grad(loss)(h)
                        # renormalize to keep magnitudes stable across the chain
                        h = g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12)
                        return h, ()

                    hN, _ = jax.lax.scan(step, h0, None, length=chain)
                    return jnp.sum(hN.astype(jnp.float32))

                return lambda: run(h0, G.src, G.dst, G.edge_mask, Ws, bs)

            best, chain = measure(make_run)
            eps = real_edges * depth * chain / best
            results.append({"name": name, "edges_per_sec": round(eps)})
            print(json.dumps(results[-1]), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": repr(e)[:300]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

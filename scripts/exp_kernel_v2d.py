"""TPU experiment round 3: size-sorted sub-batch aggregates (2 and 4 groups)
for the v2 fused kernel. One JSON line per variant."""

from __future__ import annotations

import csv
import json
import os
import threading
import time


def _arm_watchdog(seconds: int = 2400) -> None:
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
    from notorch_tpu.kernels.dense_mpnn import fused_dense_mpnn_block
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

    key = jax.random.PRNGKey(0)
    # params sized once (shape-independent)
    dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
    ev = dembed.init(key, dbg0)
    G0 = dembed.apply(ev, dbg0)
    bv = dblock.init(key, G0)
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

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

    order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)

    for n_groups in (8, 4):
        name = f"fwd_sorted{n_groups}_tile16"
        try:
            gs = len(graphs) // n_groups
            prepped = []
            for k in range(n_groups):
                grp = [graphs[i] for i in order[k * gs : (k + 1) * gs]]
                Vg = -(-(max(g.num_nodes for g in grp) + 1) // 8) * 8
                Eg = -(-max(g.num_edges for g in grp) // 16) * 16
                dbg_g = pad_graphs_dense(grp, Vg, Eg)
                Gg = dembed.apply(ev, dbg_g)
                Gmg = Gg.gather_matrix(jnp.float32)
                h0g = jnp.einsum("bev,bvd->bed", Gmg, Gg.node_feats) + Gg.edge_feats
                prepped.append((h0g, Gg.src, Gg.dst, Gg.edge_mask, Vg, Eg))
            print(json.dumps({"caps": [(p[4], p[5]) for p in prepped]}), flush=True)

            def make_run(chain, prepped=prepped):
                @jax.jit
                def run(Ws, bs):
                    acc = jnp.zeros((), jnp.float32)
                    for h0g, src, dst, emask, Vg, _ in prepped:
                        def body(_, x, src=src, dst=dst, emask=emask, Vg=Vg):
                            return fused_dense_mpnn_block(
                                x, src, dst, emask, Ws, bs,
                                depth=depth, n_nodes=Vg, residual=True,
                                mols_per_tile=16,
                            )
                        acc += jnp.sum(
                            jax.lax.fori_loop(0, chain, body, h0g).astype(jnp.float32)
                        )
                    return acc

                return lambda: run(Ws, bs)

            best, chain = measure(make_run)
            eps = real_edges * depth * chain / best
            print(json.dumps({"name": name, "edges_per_sec": round(eps)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": repr(e)[:250]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()

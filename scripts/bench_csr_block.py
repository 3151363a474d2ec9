"""TPU benchmark: flat-layout ChempropBlock impl comparison.

Measures fwd and fwd+bwd edge-layer rates of the FLAT layout's three
E->V reduce implementations — ``segment`` (XLA segment_sum), ``gather``
(fixed-degree gathers), ``csr`` (tile-packed Pallas SpMM) — on a 512-mol
lipo batch, hidden 256, depth 3. This is the benchmark behind the
"fuse or demote" decision (README layout policy): the flat block is
gather/GEMM-dominated, so the CSR reduce win washes out at block level and
training routes through the dense fused kernel instead.

One JSON line per (impl, direction). Sized to complete on its own — NEVER
kill a TPU-attached process.

Run:  python scripts/bench_csr_block.py > out 2>&1 &
"""

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


def _measure(run_scalar, target_seconds: float = 1.5):
    probe = run_scalar(5)
    float(probe())
    t0 = time.perf_counter()
    float(probe())
    dt5 = time.perf_counter() - t0
    chain = max(10, min(2000, int(target_seconds / max(dt5 / 5, 1e-5))))
    run = run_scalar(chain)
    float(run())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best, chain


def main() -> None:
    _arm_watchdog()
    import sys

    import jax

    if "--cpu" in sys.argv:  # smoke-test mode (the axon TPU plugin ignores
        jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS from env)
    import jax.numpy as jnp

    from notorch_tpu.data.graph import pad_graphs, with_csr_packing
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    print("devices:", jax.devices(), flush=True)

    hidden, depth = 256, 3
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)

    total_v = sum(g.num_nodes for g in graphs) + 1
    v_cap = -(-total_v // 1024) * 1024
    e_cap = -(-real_edges // 2048) * 2048
    bg = pad_graphs(graphs, v_cap, e_cap, graph_cap=len(graphs))
    bg_csr = with_csr_packing(bg)

    key = jax.random.PRNGKey(0)
    embed = GraphEmbedding(hidden_dim=hidden)
    ev = embed.init(key, bg)
    G = embed.apply(ev, bg)
    G_csr = embed.apply(ev, bg_csr)

    for impl in ("segment", "gather", "csr"):
        block = ChempropBlock(hidden_dim=hidden, depth=depth, impl=impl)
        Gi = G_csr if impl == "csr" else G
        bv = block.init(key, Gi)

        def make_fwd(chain, block=block, bv=bv, Gi=Gi):
            @jax.jit
            def run(bv, G):
                def body(_, ef):
                    return block.apply(bv, G.update(edge_feats=ef)).edge_feats

                return jnp.sum(
                    jax.lax.fori_loop(0, chain, body, G.edge_feats).astype(jnp.float32)
                )

            return lambda: run(bv, Gi)

        best, chain = _measure(make_fwd)
        print(
            json.dumps(
                {"name": f"flat_fwd_impl={impl}",
                 "edges_per_sec": round(real_edges * depth * chain / best)}
            ),
            flush=True,
        )

        def make_fwdbwd(chain, block=block, bv=bv, Gi=Gi):
            @jax.jit
            def run(bv, G):
                def step(ef, _):
                    def loss(ef):
                        out = block.apply(bv, G.update(edge_feats=ef)).edge_feats
                        return jnp.sum(out * out)

                    g = jax.grad(loss)(ef)
                    return g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12), ()

                efN, _ = jax.lax.scan(step, G.edge_feats, None, length=chain)
                return jnp.sum(efN.astype(jnp.float32))

            return lambda: run(bv, Gi)

        best, chain = _measure(make_fwdbwd)
        print(
            json.dumps(
                {"name": f"flat_fwdbwd_impl={impl}",
                 "edges_per_sec": round(real_edges * depth * chain / best)}
            ),
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

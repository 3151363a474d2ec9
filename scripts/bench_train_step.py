"""TPU benchmark: fwd+bwd (training) edge-layer rates for the fused block.

Measures, on the real chip:

1. Block-level ``value_and_grad`` rates for every backward strategy of the
   fused Pallas kernel — ``recompute`` (per-tile forward replay in VMEM),
   ``stash`` (forward emits per-layer residuals to HBM, backward reads them
   back), ``jnp`` (jnp recompute fallback) — plus the forward-only rate for
   context, on a single max-padded 512-mol lipo batch and on 8 size-sorted
   sub-batches (the production batching).
2. The FULL model train step (``build_dmpnn(layout="auto")`` — embed +
   fused block + readout + FFN + loss + Adam through ``value_and_grad``),
   dispatched as ``Model.train_steps`` scans so the tunnel latency floor is
   amortized and the number reflects device compute.

Gradient parity across strategies is asserted before any timing.

One JSON line per measurement. Sized to complete on its own — NEVER kill a
TPU-attached process (wedges the device ~45 min).

Run:  python scripts/bench_train_step.py [--backward all] > out 2>&1 &
"""

from __future__ import annotations

import argparse
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


def _measure(run_scalar, target_seconds: float = 1.5):
    """run_scalar(chain) -> jitted callable returning a scalar. Returns
    (best_seconds, chain). Sync is a scalar fetch (block_until_ready can
    return early on tunneled TPUs)."""
    probe = run_scalar(10)
    float(probe())  # compile + warm
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


def _load_graphs(n: int = 512):
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))[:n]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(r["smiles"]) for r in rows]
    ys = [float(r["lipo"]) for r in rows]
    return graphs, ys


def bench_block_level(graphs, results: list, backwards: list[str],
                      interpret: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block,
        fused_dense_mpnn_block_trainable,
        fused_dense_mpnn_block_trainable_fast,
        fused_dense_mpnn_block_trainable_stash,
    )
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding

    hidden, depth = 256, 3
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)

    def prep(group):
        V_g = -(-(max(g.num_nodes for g in group) + 1) // 8) * 8
        E_g = -(-max(g.num_edges for g in group) // 16) * 16
        dbg = pad_graphs_dense(group, V_g, E_g)
        ev = dembed.init(key, dbg)
        G = dembed.apply(ev, dbg)
        h0 = jnp.einsum(
            "bev,bvd->bed", G.gather_matrix(jnp.float32), G.node_feats
        ) + G.edge_feats
        return h0, G.src, G.dst, G.edge_mask, V_g

    bv = dblock.init(
        key, dembed.apply(dembed.init(key, pad_graphs_dense(graphs[:8], 64, 128)),
                          pad_graphs_dense(graphs[:8], 64, 128))
    )
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    def _stash_bf16(h, src, dst, emask, W, b, depth, V_g, res, tile, interp, mm):
        return fused_dense_mpnn_block_trainable_stash(
            h, src, dst, emask, W, b, depth, V_g, res, tile, interp, mm,
            "bfloat16",
        )

    fns = {
        "jnp": fused_dense_mpnn_block_trainable,
        "recompute": fused_dense_mpnn_block_trainable_fast,
        "stash": fused_dense_mpnn_block_trainable_stash,
        "stash_bf16": _stash_bf16,  # residuals stored bf16 (half the traffic)
    }

    # --- gradient parity gate (vs the jnp backward) on a small slice -------
    # Run under highest matmul precision: at the TPU default (bf16
    # multiplies) a recomputed h_in can land on the other side of the ReLU
    # threshold for entries with |h| ~ bf16 noise, flipping single gradient
    # entries — an O(1) max-rel outlier that is NOT a kernel bug. Highest
    # precision removes the flips; the norm check below is the robust
    # metric either way.
    h0, src, dst, emask, V_g = prep(graphs[:8])

    def gradset(fn):
        def loss(h, W):
            out = fn(h, src, dst, emask, W, bs, depth, V_g, True, 8, interpret, None)
            return jnp.sum(out * out)

        return jax.grad(loss, argnums=(0, 1))(h0, Ws)

    with jax.default_matmul_precision("highest"):
        ref_g = gradset(fns["jnp"])
        # stash_bf16 deliberately rounds the stored residuals to bf16, so its
        # gate is the bf16-rounding budget, not exactness
        for name, bar in (("recompute", 1e-3), ("stash", 1e-3),
                          ("stash_bf16", 2e-2)):
            got = gradset(fns[name])
            for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got)):
                rel = float(
                    jnp.linalg.norm((a - b).ravel())
                    / (jnp.linalg.norm(a.ravel()) + 1e-9)
                )
                if rel > bar:
                    raise RuntimeError(f"grad mismatch {name}: rel_l2={rel}")
    print(json.dumps({"check": "grad_parity", "ok": True}), flush=True)

    # --- prepare batches: single max-padded + 8 size-sorted groups ---------
    single = [prep(graphs)]
    n_groups = 8
    order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)
    gs = len(graphs) // n_groups
    grouped = [
        prep([graphs[i] for i in order[k * gs : (k + 1) * gs]]) for k in range(n_groups)
    ]

    for batching, prepped in (("single", single), ("sorted8", grouped)):
        # forward-only context number
        def make_fwd(chain):
            @jax.jit
            def run(Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for h0, src, dst, emask, V_g in prepped:
                    def body(_, h, src=src, dst=dst, emask=emask, V_g=V_g):
                        return fused_dense_mpnn_block(
                            h, src, dst, emask, Ws, bs,
                            depth=depth, n_nodes=V_g, residual=True,
                            mols_per_tile=8, interpret=interpret,
                        )
                    acc += jnp.sum(
                        jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32)
                    )
                return acc

            return lambda: run(Ws, bs)

        best, chain = _measure(make_fwd)
        eps = real_edges * depth * chain / best
        results.append(
            {"name": f"block_fwd_{batching}", "edges_per_sec": round(eps)}
        )
        print(json.dumps(results[-1]), flush=True)

        for bwd_name in backwards:
            fn = fns[bwd_name]

            def make_run(chain, fn=fn):
                @jax.jit
                def run(Ws, bs):
                    acc = jnp.zeros((), jnp.float32)
                    for h0, src, dst, emask, V_g in prepped:
                        def step(h, _, src=src, dst=dst, emask=emask, V_g=V_g):
                            def loss(h):
                                out = fn(
                                    h, src, dst, emask, Ws, bs,
                                    depth, V_g, True, 8, interpret, None,
                                )
                                return jnp.sum(out * out)

                            g = jax.grad(loss)(h)
                            h = g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12)
                            return h, ()

                        hN, _ = jax.lax.scan(step, h0, None, length=chain)
                        acc += jnp.sum(hN.astype(jnp.float32))
                    return acc

                return lambda: run(Ws, bs)

            try:
                best, chain = _measure(make_run)
                eps = real_edges * depth * chain / best
                results.append(
                    {
                        "name": f"block_fwdbwd_{batching}_bwd={bwd_name}",
                        "edges_per_sec": round(eps),
                    }
                )
                print(json.dumps(results[-1]), flush=True)
            except Exception as e:  # noqa: BLE001
                print(
                    json.dumps(
                        {"name": f"block_fwdbwd_{batching}_bwd={bwd_name}",
                         "error": repr(e)[:300]}
                    ),
                    flush=True,
                )


def bench_full_train_step(graphs, ys, results: list, k: int = 32) -> None:
    """Full production train step (embed + fused block + readout + FFN +
    MSE + Adam), K steps per dispatch via Model.train_steps."""
    import jax
    import numpy as np

    from notorch_tpu.data.batching import stack_trees
    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.models.dmpnn import build_dmpnn

    depth = 3
    # size-sorted 64-mol batches, per-batch caps (what the dense DataLoader does)
    order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)
    bsz = 64
    batches = []
    total_real_edges = 0
    for s in range(0, len(order), bsz):
        grp = [graphs[i] for i in order[s : s + bsz]]
        if len(grp) < bsz:
            continue
        V_g = -(-(max(g.num_nodes for g in grp) + 1) // 8) * 8
        E_g = -(-max(g.num_edges for g in grp) // 16) * 16
        dbg = pad_graphs_dense(grp, V_g, E_g)
        y = np.asarray([[ys[i]] for i in order[s : s + bsz]], np.float32)
        batches.append(
            {"inputs.G": dbg, "targets.y": y,
             "targets.y_mask": np.ones_like(y, dtype=bool)}
        )
        total_real_edges += sum(g.num_edges for g in grp)

    model = build_dmpnn(hidden_dim=256, depth=depth)  # layout="auto" -> dense_fused
    state = model.init(jax.random.PRNGKey(0), batches[0])

    # one distinct shape per group: run each group's batch K times per dispatch
    import jax.numpy as jnp

    from notorch_tpu.data.batching import shape_signature

    groups = {}
    for b in batches:
        groups.setdefault(shape_signature(b), []).append(b)

    # warm compile on every distinct shape (stacked)
    stacked = []
    for sig, bs_ in groups.items():
        rep = (bs_ * k)[:k]
        stacked.append((stack_trees(rep), sum(1 for _ in rep)))
    for tree, _ in stacked:
        state, _ = model.train_steps(state, tree)
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # sync (scalar fetch)

    # timed epoch-equivalent: every stacked group once
    t0 = time.perf_counter()
    n_steps = 0
    for tree, n in stacked:
        state, logs = model.train_steps(state, tree)
        n_steps += k
    # sync via scalar fetch
    float(logs["train/loss"])
    dt = time.perf_counter() - t0
    steps_per_sec = n_steps / dt
    # edges per train step: average real edges per batch
    avg_edges = total_real_edges / len(batches)
    eps = steps_per_sec * avg_edges * depth
    results.append(
        {
            "name": f"full_train_step_k={k}",
            "steps_per_sec": round(steps_per_sec, 1),
            "train_step_edges_per_sec": round(eps),
            "n_shapes": len(stacked),
        }
    )
    print(json.dumps(results[-1]), flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backward", default="all",
                        help="comma list of {recompute,stash,jnp} or 'all'")
    parser.add_argument("--skip-full", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="smoke-test on CPU (interpret-mode kernels)")
    parser.add_argument("--mols", type=int, default=512)
    args = parser.parse_args()
    backwards = (
        ["recompute", "stash", "stash_bf16", "jnp"] if args.backward == "all"
        else args.backward.split(",")
    )

    _arm_watchdog()
    import jax

    if args.cpu:  # the axon TPU plugin ignores JAX_PLATFORMS from the env
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), flush=True)
    graphs, ys = _load_graphs(args.mols)
    results: list = []
    bench_block_level(graphs, results, backwards, interpret=args.cpu)
    if not args.skip_full:
        bench_full_train_step(graphs, ys, results)
    print("DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())

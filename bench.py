"""Benchmark: edges/sec/chip of D-MPNN message passing (the north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Path measured: the fused Pallas dense-layout block kernel
(``notorch_tpu.kernels.dense_mpnn`` — whole depth-3 block VMEM-resident,
scatter+gather collapsed to one edge-to-edge one-hot consumed by the MXU)
over BIN-PACKED blocks (``pack_graphs_dense``: several molecules per
128-edge block with per-molecule node-id offsets — 94.7% real-edge lanes
vs 79.3% for size-sorted groups, ONE compiled shape), falling back to
size-sorted per-molecule groups if a molecule exceeds the bin, then to the
flat XLA segment_sum path if the Pallas kernel cannot compile on this
target. Measured on TPU v5e: 427.9M edge-layer updates/s forward, 181.0M
through value_and_grad (sorted-8 groups: 375M / 144M; best XLA path:
46.6M).

Methodology: the block is iterated inside one jitted ``lax.fori_loop``
(edge state fed back), reduced to a scalar in-jit and fetched to host — on
tunneled platforms ``block_until_ready`` can return early, and the tunnel
has a 30-50 ms latency floor, so chains are sized to >=1 s of device work.
"Edges/s" counts edge-layer updates: real_edges x depth x chain / time.

``vs_baseline``: the reference stack (torch + torch_scatter + Lightning) is
not installable here; the baseline is the reference-equivalent recurrence
via torch.index_add on this host's CPU — the same semantics the reference
executes, on the hardware available to it in this image.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Pinned baseline denominator so ``vs_baseline`` is comparable across rounds
# (the live remeasure runs on a contended host and drifted 414k-592k edges/s
# between rounds for the identical computation). Provenance: best of 5 runs
# of ``_torch_cpu_baseline(iters=5)`` on this image's CPU, 2026-08-20
# (512-mol lipo batch, hidden 256, depth 3; samples 436868/525506/386374/
# 514318/592559 — matches round 2's implied 591.8k). Re-measure with
# ``python bench.py --remeasure-baseline``.
PINNED_BASELINE_EDGES_PER_SEC = 592_559.0


def _torch_cpu_baseline(bg, d: int, depth: int, iters: int = 5) -> float:
    """Reference-equivalent D-MPNN recurrence: torch CPU, index_add scatter."""
    import torch

    E, V = bg.num_edges, bg.num_nodes
    g = torch.Generator().manual_seed(0)
    node_feats = torch.randn(V, d, generator=g)
    edge_feats = torch.randn(E, d, generator=g)
    src = torch.from_numpy(np.asarray(bg.src)).long()
    dst = torch.from_numpy(np.asarray(bg.dst)).long()
    rev = torch.from_numpy(np.asarray(bg.rev)).long()
    Ws = [torch.randn(d, d, generator=g) / d**0.5 for _ in range(depth)]
    bs = [torch.zeros(d) for _ in range(depth)]

    def run():
        h = node_feats[src] + edge_feats
        for W, b in zip(Ws, bs):
            m = torch.relu(h)
            node_m = torch.zeros(V, d).index_add_(0, dst, m)
            h = h + (node_m[src] - m[rev]) @ W + b
        return torch.zeros(V, d).index_add_(0, dst, h)

    run()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    real_edges = int(np.asarray(bg.edge_mask).sum())
    return real_edges * depth / dt


def _measure_chain(run_scalar, target_seconds: float = 1.5, samples: int = 4):
    """run_scalar(chain) -> jitted callable returning a scalar; returns
    (best_dt, chain, sample_dts). Best-of-N with the raw samples kept:
    tunnel round-trip variance moved same-round headline numbers by ~8%
    between measurements (round-3 verdict weak #6), so the spread is part
    of the result, not noise to discard."""
    probe = run_scalar(10)
    float(probe())  # compile + warm
    t0 = time.perf_counter()
    float(probe())
    dt10 = time.perf_counter() - t0
    chain = max(20, min(3000, int(target_seconds / max(dt10 / 10, 1e-5))))
    run = run_scalar(chain)
    float(run())
    dts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(run())
        dts.append(time.perf_counter() - t0)
    return min(dts), chain, dts


def _spread(samples) -> float | None:
    """(max-min)/min as a percentage — the run-to-run envelope."""
    if not samples:
        return None
    return round(100.0 * (max(samples) - min(samples)) / min(samples), 1)


def _arm_watchdog(seconds: int = 2400) -> None:
    """Exit cleanly if the device never responds (a wedged TPU would
    otherwise hang forever, and killing an attached process from outside
    wedges it further)."""
    import os
    import sys
    import threading

    def die():
        print(
            "bench watchdog: device did not complete within "
            f"{seconds}s; aborting without a measurement",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(seconds, die)
    t.daemon = True
    t.start()


def _roofline_seconds(prepped, d: int, depth: int, device_kind: str,
                      train: bool = False) -> float:
    """Lower-bound seconds per fused-block invocation from the HBM and MXU
    rooflines, at the ACTUAL padded shapes. Forward: read h0 + write h once,
    2 matmuls/layer ([BE,d]@[d,d] and per-mol [E,E]@[E,d]). Train
    (residual-stash backward; h0 never duplicated into the stash) adds
    2*(depth-1) stash trips + bwd re-read of h0 + read g + write gh and
    3 more matmuls/layer. Returns max(t_mem, t_mxu)."""
    kind = device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "v5litepod" in kind:
        hbm_bw, mxu = 819e9, 197e12  # bf16 matmul peak
    elif "v5p" in kind or "v5" in kind:
        hbm_bw, mxu = 2765e9, 459e12
    elif "v4" in kind:
        hbm_bw, mxu = 1228e9, 275e12
    else:  # unknown (incl. CPU smoke) — v5e numbers as the stated reference
        hbm_bw, mxu = 819e9, 197e12
    bytes_total = 0.0
    flops = 0.0
    for h0, src, dst, emask, V_g in prepped:
        B, E, _ = h0.shape
        trips = (2 * depth + 3) if train else 2  # E-tensor HBM round trips (f32)
        bytes_total += trips * B * E * d * 4
        per_layer = 2 * B * E * d * d + 2 * B * E * E * d
        mults = 5 if train else 2
        flops += depth * per_layer * (mults / 2)
    return max(bytes_total / hbm_bw, flops / mxu)


def main() -> None:
    import csv
    import os

    _arm_watchdog()

    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_mpnn_block,
        fused_dense_mpnn_block_trainable_stash,
    )
    from notorch_tpu.nn.chemprop import ChempropBlock
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden, depth = 256, 3
    path = os.path.join(os.path.dirname(__file__), "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)

    edges_per_sec = None
    try:
        # fused Pallas dense path over bin-packed blocks (the fast path):
        # several molecules per 128-edge block, node ids offset per molecule
        # so the kernel's one-hot compares stay molecule-local
        dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
        dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
        dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
        ev = dembed.init(key, dbg0)
        bv = dblock.init(key, dembed.apply(ev, dbg0))
        Ws = jnp.stack(
            [bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)]
        )
        bs = jnp.stack(
            [bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)]
        )

        def prep_packed():
            from notorch_tpu.data.dense import pack_graphs_dense, plan_bins

            E_b, V_b = 128, 72
            if max(g.num_edges for g in graphs) > E_b:
                raise ValueError("molecule exceeds the 128-edge bin")
            n_bins = len(plan_bins(graphs, V_b, E_b))
            n_bins = -(-n_bins // 8) * 8  # kernel tiles 8 bins at a time
            pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
            G = dembed.apply(ev, pk)
            Gm = G.gather_matrix(jnp.float32)
            h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
            return [(h0, G.src, G.dst, G.edge_mask, V_b)], [G]

        def prep_sorted():
            n_groups = 8
            order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)
            gs = len(graphs) // n_groups
            prepped, Gs = [], []
            for k in range(n_groups):
                grp = [graphs[i] for i in order[k * gs : (k + 1) * gs]]
                V_g = -(-(max(g.num_nodes for g in grp) + 1) // 8) * 8
                E_g = -(-max(g.num_edges for g in grp) // 16) * 16
                dbg = pad_graphs_dense(grp, V_g, E_g)
                G = dembed.apply(ev, dbg)
                Gm = G.gather_matrix(jnp.float32)
                h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
                prepped.append((h0, G.src, G.dst, G.edge_mask, V_g))
                Gs.append(G)
            return prepped, Gs

        try:
            prepped, Gs = prep_packed()
        except Exception:
            prepped, Gs = prep_sorted()

        # correctness gate before timing (relative: TPU f32 dot_general
        # multiplies in bf16 at default precision, so summation-order
        # changes show up at ~0.4%)
        for (h0, src, dst, emask, V_g), G in zip(prepped, Gs):
            ref = dblock.apply(bv, G).edge_feats
            out = fused_dense_mpnn_block(
                h0, src, dst, emask, Ws, bs,
                depth=depth, n_nodes=V_g, residual=True, mols_per_tile=8,
            )
            mask = emask[..., None].astype(jnp.float32)
            rel = float(
                jnp.abs((out - ref) * mask).max() / jnp.abs(ref * mask).max()
            )
            if rel > 0.02:
                raise RuntimeError(f"fused kernel mismatch: rel={rel}")

        def make_run(chain):
            @jax.jit
            def run(Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for h0, src, dst, emask, V_g in prepped:
                    def body(_, h, src=src, dst=dst, emask=emask, V_g=V_g):
                        return fused_dense_mpnn_block(
                            h, src, dst, emask, Ws, bs,
                            depth=depth, n_nodes=V_g, residual=True, mols_per_tile=8,
                        )
                    acc += jnp.sum(
                        jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32)
                    )
                return acc

            return lambda: run(Ws, bs)

        best, chain, dts = _measure_chain(make_run)
        edges_per_sec = real_edges * depth * chain / best
        fwd_samples = [round(real_edges * depth * chain / dt, 1) for dt in dts]

        # %-of-roofline at the measured padding mix (HBM/MXU lower bound)
        kind = jax.devices()[0].device_kind
        t_sol = _roofline_seconds(prepped, hidden, depth, kind)
        pct_of_roofline = round(100.0 * t_sol / (best / chain), 1)

        # training-step rate: fwd+bwd through value_and_grad on the same
        # size-sorted groups (the production backward: Pallas residual-stash)
        def make_train(chain):
            @jax.jit
            def run(Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for h0, src, dst, emask, V_g in prepped:
                    def step(h, _, src=src, dst=dst, emask=emask, V_g=V_g):
                        def loss(h):
                            out = fused_dense_mpnn_block_trainable_stash(
                                h, src, dst, emask, Ws, bs,
                                depth, V_g, True, 8, False, None,
                            )
                            return jnp.sum(out * out)

                        g = jax.grad(loss)(h)
                        return g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12), ()

                    hN, _ = jax.lax.scan(step, h0, None, length=chain)
                    acc += jnp.sum(hN.astype(jnp.float32))
                return acc

            return lambda: run(Ws, bs)

        try:
            tbest, tchain, tdts = _measure_chain(make_train)
            train_edges_per_sec = round(real_edges * depth * tchain / tbest, 1)
            train_samples = [round(real_edges * depth * tchain / dt, 1) for dt in tdts]
            t_sol_train = _roofline_seconds(prepped, hidden, depth, kind, train=True)
            train_pct_of_roofline = round(
                100.0 * t_sol_train / (tbest / tchain), 1
            )
        except Exception:
            train_edges_per_sec = None
            train_pct_of_roofline = None
            train_samples = None
    except Exception:
        edges_per_sec = None
        pct_of_roofline = None
        train_edges_per_sec = None
        train_pct_of_roofline = None
        fwd_samples = None
        train_samples = None

    if edges_per_sec is None:
        # fallback: flat XLA segment path
        total_v = sum(g.num_nodes for g in graphs) + 1
        v_cap = -(-total_v // 1024) * 1024
        e_cap = -(-real_edges // 2048) * 2048
        bg = pad_graphs(graphs, v_cap, e_cap, graph_cap=len(graphs))
        embed = GraphEmbedding(hidden_dim=hidden)
        block = ChempropBlock(hidden_dim=hidden, depth=depth, impl="segment")
        ev = embed.init(key, bg)
        G2 = embed.apply(ev, bg)
        bv2 = block.init(key, G2)

        def make_run(chain):
            @jax.jit
            def run(variables, G):
                def body(_, ef):
                    return block.apply(variables, G.update(edge_feats=ef)).edge_feats
                return jnp.sum(
                    jax.lax.fori_loop(0, chain, body, G.edge_feats).astype(jnp.float32)
                )

            return lambda: run(bv2, G2)

        best, chain, dts = _measure_chain(make_run)
        edges_per_sec = real_edges * depth * chain / best
        fwd_samples = [round(real_edges * depth * chain / dt, 1) for dt in dts]
        pct_of_roofline = None
        train_edges_per_sec = None
        train_pct_of_roofline = None
        train_samples = None

    # flat padded batch reused for the torch baseline topology
    total_v = sum(g.num_nodes for g in graphs) + 1
    bg_base = pad_graphs(
        graphs, total_v, real_edges, graph_cap=len(graphs), np_out=True
    )
    baseline_live = _torch_cpu_baseline(bg_base, hidden, depth)

    print(
        json.dumps(
            {
                "metric": "dmpnn_message_passing_edges_per_sec_per_chip",
                "value": round(edges_per_sec, 1),
                "unit": "edges/s",
                # pinned denominator (PINNED_BASELINE_EDGES_PER_SEC) so the
                # ratio is comparable across rounds; the live remeasure
                # reflects this run's host contention only
                "vs_baseline": round(
                    edges_per_sec / PINNED_BASELINE_EDGES_PER_SEC, 3
                ),
                "vs_baseline_live": round(edges_per_sec / baseline_live, 3),
                "baseline_live_edges_per_sec": round(baseline_live, 1),
                # training is the product: fwd+bwd through value_and_grad
                # on the same size-sorted batches (Pallas recompute backward)
                "train_step_edges_per_sec": train_edges_per_sec,
                # %-of-HBM/MXU-roofline at the measured padding mix — the
                # north star "speed-of-light per chip" as a number
                "pct_of_roofline": pct_of_roofline,
                "train_pct_of_roofline": train_pct_of_roofline,
                # best-of-N raw samples + spread: tunnel variance moved
                # same-round numbers ~8%; cross-round deltas smaller than
                # the spread are not real
                "fwd_samples_edges_per_sec": fwd_samples,
                "train_samples_edges_per_sec": train_samples,
                "fwd_spread_pct": _spread(fwd_samples),
                "train_spread_pct": _spread(train_samples),
            }
        )
    )


def remeasure_baseline(samples: int = 5) -> None:
    """Re-sample the torch-CPU baseline (for re-pinning
    PINNED_BASELINE_EDGES_PER_SEC; prints samples + best, no TPU use)."""
    import csv
    import os

    from notorch_tpu.data.graph import pad_graphs
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    path = os.path.join(os.path.dirname(__file__), "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    total_v = sum(g.num_nodes for g in graphs) + 1
    bg = pad_graphs(graphs, total_v, real_edges, graph_cap=len(graphs), np_out=True)
    vals = [_torch_cpu_baseline(bg, 256, 3) for _ in range(samples)]
    print(
        json.dumps(
            {
                "samples_edges_per_sec": [round(v, 1) for v in vals],
                "best": round(max(vals), 1),
                "pinned": PINNED_BASELINE_EDGES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--remeasure-baseline" in sys.argv:
        remeasure_baseline()
    else:
        main()

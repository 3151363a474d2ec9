"""TPU experiment: v3 whole-encoder kernel vs block kernel + XLA einsum ends.

Compares, on the real chip, the ENCODER-equivalent computation
(h0 = gather(node) + edge_feats -> depth-D block -> masked scatter to
node hiddens) two ways:

  a) "block+einsum" — today's production path: XLA builds the [B,E,V] /
     [B,V,E] one-hot operators in HBM, einsums h0 / node_hiddens, and the
     fused block kernel runs in between (backward = residual stash).
  b) "encoder"      — the v3 kernel: one pallas_call each way; one-hots
     built in VMEM from an iota compare; h0 never touches HBM.

Also sweeps the size-sorted group count (8 vs 16) — the fwd+bwd path is
MXU-bound, so padded-lane waste is the lever that remains.

Gradient parity (encoder vs jnp dense block) is asserted on-chip first.

One JSON line per measurement. Sized to complete on its own — NEVER kill a
TPU-attached process (wedges the device ~45 min).

Run:  python scripts/exp_encoder_v3.py > out 2>&1 &
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


def _measure(run_scalar, target_seconds: float = 1.5):
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


def main() -> None:
    _arm_watchdog()
    import jax
    import jax.numpy as jnp

    from notorch_tpu.data.dense import pad_graphs_dense
    from notorch_tpu.kernels.dense_mpnn import (
        fused_dense_encoder,
        fused_dense_mpnn_block_trainable_stash,
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
    key = jax.random.PRNGKey(0)
    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)

    def prep(group):
        V_g = -(-(max(g.num_nodes for g in group) + 1) // 8) * 8
        E_g = -(-max(g.num_edges for g in group) // 16) * 16
        dbg = pad_graphs_dense(group, V_g, E_g)
        ev = dembed.init(key, dbg)
        return dembed.apply(ev, dbg)

    bv = dblock.init(key, prep(graphs[:8]))
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    # --- on-chip gradient parity: encoder vs jnp dense block ----------------
    G0 = prep(graphs[:8])
    nmask = G0.node_mask.astype(jnp.float32)[..., None]

    def loss_enc(nf, ef, Ws, bs):
        nh, eh = fused_dense_encoder(
            nf, ef, G0.src, G0.dst, G0.edge_mask, Ws, bs, depth, True, 8,
            False, None, None,
        )
        return ((nh * nmask) ** 2).sum()

    def loss_ref(nf, ef, Ws, bs):
        params = {
            f"layer_{i}": {"update": {"kernel": Ws[i], "bias": bs[i]}}
            for i in range(depth)
        }
        out = dblock.apply({"params": params}, G0.update(node_feats=nf, edge_feats=ef))
        return ((out.node_feats * nmask) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_enc, argnums=(0, 1, 2, 3))(G0.node_feats, G0.edge_feats, Ws, bs)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(G0.node_feats, G0.edge_feats, Ws, bs)
        for a, b in zip(g1, g2):
            rel = float(
                jnp.linalg.norm((a - b).ravel()) / (jnp.linalg.norm(b.ravel()) + 1e-9)
            )
            if rel > 1e-3:
                raise RuntimeError(f"encoder grad mismatch on chip: rel_l2={rel}")
    print(json.dumps({"check": "encoder_grad_parity_tpu", "ok": True}), flush=True)

    # --- rate sweeps ---------------------------------------------------------
    for n_groups in (8, 16):
        order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)
        gs = len(graphs) // n_groups
        prepped = [
            prep([graphs[i] for i in order[k * gs : (k + 1) * gs]])
            for k in range(n_groups)
        ]

        # (a) block kernel + XLA einsum ends, fwd+bwd
        def make_block(chain):
            @jax.jit
            def run(Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for G in prepped:
                    nmask = G.node_mask.astype(jnp.float32)[..., None]

                    def step(carry, _, G=G, nmask=nmask):
                        nf, ef = carry

                        def loss(nf, ef):
                            Gm = G.gather_matrix(jnp.float32)
                            h0 = jnp.einsum("bev,bvd->bed", Gm, nf) + ef
                            out = fused_dense_mpnn_block_trainable_stash(
                                h0, G.src, G.dst, G.edge_mask, Ws, bs,
                                depth, G.nodes_per_graph, True, 8, False, None,
                            )
                            S = G.scatter_matrix(jnp.float32)
                            nh = jnp.einsum("bve,bed->bvd", S, out)
                            return ((nh * nmask) ** 2).sum()

                        gn, ge = jax.grad(loss, argnums=(0, 1))(nf, ef)
                        s = jax.lax.rsqrt(jnp.mean(ge * ge) + 1e-12)
                        return (gn * s, ge * s), ()

                    (nfN, efN), _ = jax.lax.scan(
                        step, (G.node_feats, G.edge_feats), None, length=chain
                    )
                    acc += jnp.sum(efN.astype(jnp.float32))
                return acc

            return lambda: run(Ws, bs)

        # (b) v3 encoder kernel, fwd+bwd
        def make_enc(chain):
            @jax.jit
            def run(Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for G in prepped:
                    nmask = G.node_mask.astype(jnp.float32)[..., None]

                    def step(carry, _, G=G, nmask=nmask):
                        nf, ef = carry

                        def loss(nf, ef):
                            nh, eh = fused_dense_encoder(
                                nf, ef, G.src, G.dst, G.edge_mask, Ws, bs,
                                depth, True, 8, False, None, None,
                            )
                            return ((nh * nmask) ** 2).sum()

                        gn, ge = jax.grad(loss, argnums=(0, 1))(nf, ef)
                        s = jax.lax.rsqrt(jnp.mean(ge * ge) + 1e-12)
                        return (gn * s, ge * s), ()

                    (nfN, efN), _ = jax.lax.scan(
                        step, (G.node_feats, G.edge_feats), None, length=chain
                    )
                    acc += jnp.sum(efN.astype(jnp.float32))
                return acc

            return lambda: run(Ws, bs)

        # encoder forward-only for context
        def make_enc_fwd(chain):
            @jax.jit
            def run(Ws, bs):
                acc = jnp.zeros((), jnp.float32)
                for G in prepped:
                    def body(_, ef, G=G):
                        nh, eh = fused_dense_encoder(
                            G.node_feats, ef, G.src, G.dst, G.edge_mask, Ws, bs,
                            depth, True, 8, False, None, None,
                        )
                        return eh

                    acc += jnp.sum(
                        jax.lax.fori_loop(0, chain, body, G.edge_feats).astype(
                            jnp.float32
                        )
                    )
                return acc

            return lambda: run(Ws, bs)

        for name, make in (
            (f"encfwd_g{n_groups}", make_enc_fwd),
            (f"block+einsum_g{n_groups}", make_block),
            (f"encoder_g{n_groups}", make_enc),
        ):
            try:
                best, chain = _measure(make)
                eps = real_edges * depth * chain / best
                print(
                    json.dumps({"name": name, "edges_per_sec": round(eps)}),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": name, "error": repr(e)[:300]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())

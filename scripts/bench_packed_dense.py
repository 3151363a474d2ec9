"""TPU benchmark: bin-packed dense layout vs size-sorted per-molecule groups.

The fwd+bwd path is MXU-bound (5 matmuls/layer), so the remaining lever is
the REAL-edge fraction of every contraction. Packing several molecules into
each [V_bin, E_bin] block (per-molecule node-id offsets keep the kernels
exact) pushes that fraction toward 1 and collapses the batch to ONE
compiled shape.

Measures, on 512 lipo molecules at hidden 256 / depth 3:
  - packing density (real edges / padded lanes) for bins vs sorted groups
  - fused block kernel (stash backward) fwd and fwd+bwd on packed bins
  - the v3 whole-encoder kernel on packed bins (full node slots may favor
    its in-kernel V-dim matmuls)
Gradient parity of the packed pipeline is asserted on-chip first.

One JSON line per measurement. Sized to complete on its own — NEVER kill a
TPU-attached process (wedges the device ~45 min).

Run:  python scripts/bench_packed_dense.py > out 2>&1 &
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

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense
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

    bv = dblock.init(
        key, dembed.apply(dembed.init(key, pad_graphs_dense(graphs[:8], 64, 128)),
                          pad_graphs_dense(graphs[:8], 64, 128))
    )
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    # sorted-8-group density for reference
    order = sorted(range(len(graphs)), key=lambda i: graphs[i].num_edges)
    gs = len(graphs) // 8
    sorted_lanes = 0
    for k in range(8):
        grp = [graphs[i] for i in order[k * gs : (k + 1) * gs]]
        E_g = -(-max(g.num_edges for g in grp) // 16) * 16
        sorted_lanes += len(grp) * E_g

    # --- on-chip packed grad parity (vs the per-molecule jnp path) ----------
    from notorch_tpu.nn.chemprop_dense import PackedSum

    small = graphs[:32]
    pk = pack_graphs_dense(small, 72, 128)
    pd = pad_graphs_dense(small, 64, 128)
    ev = dembed.init(key, pd)
    Gd = dembed.apply(ev, pd)
    Gp = dembed.apply(ev, pk)

    def loss_packed(Ws, bs):
        Gm = Gp.gather_matrix(jnp.float32)
        h0 = jnp.einsum("bev,bvd->bed", Gm, Gp.node_feats) + Gp.edge_feats
        # tile 4: under highest matmul precision (this parity gate) the
        # stash backward at tile 8 x E=128 exceeds the 16M VMEM scope
        B = Gp.n_graphs
        tile = max(t for t in (4, 2, 1) if B % t == 0)
        out = fused_dense_mpnn_block_trainable_stash(
            h0, Gp.src, Gp.dst, Gp.edge_mask, Ws, bs,
            depth, Gp.nodes_per_graph, True, tile, False, None,
        )
        S = Gp.scatter_matrix(jnp.float32)
        nh = jnp.einsum("bve,bed->bvd", S, out)
        H = PackedSum().apply({}, Gp.update(node_feats=nh))
        return (H ** 2).sum()

    def loss_dense(Ws, bs):
        params = {
            f"layer_{i}": {"update": {"kernel": Ws[i], "bias": bs[i]}}
            for i in range(depth)
        }
        out = dblock.apply({"params": params}, Gd)
        mask = Gd.node_mask[..., None].astype(jnp.float32)
        H = (out.node_feats * mask).sum(axis=1)
        return (H ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_packed, argnums=(0, 1))(Ws, bs)
        g2 = jax.grad(loss_dense, argnums=(0, 1))(Ws, bs)
        for a, b in zip(g1, g2):
            rel = float(
                jnp.linalg.norm((a - b).ravel()) / (jnp.linalg.norm(b.ravel()) + 1e-9)
            )
            if rel > 1e-3:
                raise RuntimeError(f"packed grad mismatch on chip: rel_l2={rel}")
    print(json.dumps({"check": "packed_grad_parity_tpu", "ok": True}), flush=True)

    for E_b in (128, 256):
        V_b = E_b // 2 + 8
        big = max(g.num_edges for g in graphs)
        if big > E_b:
            print(json.dumps({"skip": f"E_b={E_b} < max mol edges {big}"}), flush=True)
            continue
        pk = pack_graphs_dense(graphs, V_b, E_b)
        NB = pk.n_graphs
        # pad bins to a multiple of 8 for the kernel tile
        if NB % 8:
            pad = 8 - NB % 8
            import numpy as np

            def padrow(x, n=pad):
                return jnp.concatenate([x, jnp.tile(x[-1:] * 0, (n,) + (1,) * (x.ndim - 1))])

            pk = pk.update(
                node_feats=padrow(pk.node_feats), edge_feats=padrow(pk.edge_feats),
                src=jnp.concatenate([pk.src, jnp.full((pad, E_b), V_b - 1, jnp.int32)]),
                dst=jnp.concatenate([pk.dst, jnp.full((pad, E_b), V_b - 1, jnp.int32)]),
                node_mask=padrow(pk.node_mask), edge_mask=padrow(pk.edge_mask),
                graph_mask=jnp.concatenate([pk.graph_mask, jnp.zeros(pad, bool)]),
                node_graph=jnp.concatenate(
                    [pk.node_graph, jnp.full((pad, V_b), pk.n_mols, jnp.int32)]
                ),
            )
            NB += pad
        density = real_edges / (NB * E_b)
        print(
            json.dumps(
                {
                    "name": f"packing_E{E_b}",
                    "bins": NB,
                    "density": round(density, 3),
                    "sorted8_density": round(real_edges / sorted_lanes, 3),
                }
            ),
            flush=True,
        )

        G = dembed.apply(ev, pk)
        Gm = G.gather_matrix(jnp.float32)
        h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
        tile = 8 if E_b <= 128 else 4  # VMEM: live tensors scale with tile*E_b

        # fused block kernel fwd on packed bins
        from notorch_tpu.kernels.dense_mpnn import fused_dense_mpnn_block

        def make_fwd(chain):
            @jax.jit
            def run(Ws, bs):
                def body(_, h):
                    return fused_dense_mpnn_block(
                        h, G.src, G.dst, G.edge_mask, Ws, bs,
                        depth=depth, n_nodes=V_b, residual=True, mols_per_tile=tile,
                    )
                return jnp.sum(jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32))

            return lambda: run(Ws, bs)

        # fused block fwd+bwd (stash backward)
        def make_train(chain):
            @jax.jit
            def run(Ws, bs):
                def step(h, _):
                    def loss(h):
                        out = fused_dense_mpnn_block_trainable_stash(
                            h, G.src, G.dst, G.edge_mask, Ws, bs,
                            depth, V_b, True, tile, False, None,
                        )
                        return jnp.sum(out * out)

                    g = jax.grad(loss)(h)
                    return g * jax.lax.rsqrt(jnp.mean(g * g) + 1e-12), ()

                hN, _ = jax.lax.scan(step, h0, None, length=chain)
                return jnp.sum(hN.astype(jnp.float32))

            return lambda: run(Ws, bs)

        # v3 encoder kernel fwd+bwd on packed bins
        def make_enc(chain):
            @jax.jit
            def run(Ws, bs):
                def step(carry, _):
                    nf, ef = carry

                    def loss(nf, ef):
                        nh, eh = fused_dense_encoder(
                            nf, ef, G.src, G.dst, G.edge_mask, Ws, bs,
                            depth, True, tile, False, None, None,
                        )
                        return jnp.sum(nh * nh)

                    gn, ge = jax.grad(loss, argnums=(0, 1))(nf, ef)
                    s = jax.lax.rsqrt(jnp.mean(ge * ge) + 1e-12)
                    return (gn * s, ge * s), ()

                (nfN, efN), _ = jax.lax.scan(
                    step, (G.node_feats, G.edge_feats), None, length=chain
                )
                return jnp.sum(efN.astype(jnp.float32))

            return lambda: run(Ws, bs)

        for name, make in (
            (f"packed_fwd_E{E_b}", make_fwd),
            (f"packed_fwdbwd_stash_E{E_b}", make_train),
            (f"packed_fwdbwd_encoder_E{E_b}", make_enc),
        ):
            try:
                best, chain = _measure(make)
                eps = real_edges * depth * chain / best
                print(json.dumps({"name": name, "edges_per_sec": round(eps)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": name, "error": repr(e)[:300]}), flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())

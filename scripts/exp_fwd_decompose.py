"""Decompose the fused forward kernel's time (VERDICT r2 #5): which op eats
the 55-60% of MXU-roofline headroom? Ablated kernel variants (numerically
WRONG on purpose, identical shapes/dtypes) are chain-timed like bench.py:

  full        — the production layer: relu -> mW -> A@mW - swap(mW) + b
  no_swap     — drop the pair_swap reverse-message shuffle (VPU)
  no_A        — drop the [E,E]@[E,d] edge-to-edge matmul (batched MXU)
  no_relu     — drop the activation (VPU)
  mm_only     — both matmuls only (no relu/swap/bias/residual)
  mW_only     — only the [BE,d]@[d,d] matmul per layer

The deltas tell whether the gap is VPU serialization (relu/swap between the
matmuls) or the batched A matmul's shape, and whether closing it needs a
kernel restructure or is a Mosaic scheduling floor.
"""

from __future__ import annotations

import csv
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _measure_chain  # noqa: E402


def make_kernel(depth, tile, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref, out_ref):
        i = pl.program_id(0)
        h = h_ref[:]
        NB, E, d = h.shape
        row0 = i * tile
        src = src_ref[pl.ds(row0, NB), :]
        dst = dst_ref[pl.ds(row0, NB), :]
        emask = emask_ref[pl.ds(row0, NB), :]
        mask_ok = emask.astype(jnp.float32) > 0.0
        A = jnp.where(
            (src[:, :, None] == dst[:, None, :]) & mask_ok[:, None, :], 1.0, 0.0
        ).astype(h.dtype)

        def pair_swap(x):
            p = x.reshape(NB, E // 2, 2, d)
            sw = jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2)
            return sw.reshape(NB, E, d)

        for li in range(depth):
            m = h if variant in ("no_relu", "mm_only", "mW_only") else jnp.maximum(h, 0.0)
            W = w_ref[li]
            bb = b_ref[li]
            mW = jax.lax.dot_general(
                m.reshape(NB * E, d), W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype).reshape(NB, E, d)
            if variant == "mW_only":
                h = h + mW
                continue
            if variant == "no_A":
                agg = mW
            else:
                agg = jax.lax.dot_general(
                    A, mW, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(h.dtype)
            if variant == "mm_only":
                h = h + agg
                continue
            out = agg + bb[None, None, :]
            if variant not in ("no_swap",):
                out = out - pair_swap(mW)
            h = h + out
        out_ref[:] = h

    return kernel


def run_variant(variant, h0, src, dst, emask, Ws, bs, depth, tile):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    B, E, d = h0.shape
    kernel = make_kernel(depth, tile, variant)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    def call(h):
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[
                whole((B, E)), whole((B, E)), whole((B, E)),
                pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                whole(tuple(Ws.shape)), whole(tuple(bs.shape)),
            ],
            out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
        )(src, dst, emask, h, Ws, bs)

    def make_run(chain):
        @jax.jit
        def run(Ws_, bs_):
            def body(_, h):
                return call(h)

            return jnp.sum(jax.lax.fori_loop(0, chain, body, h0).astype(jnp.float32))

        return lambda: run(Ws, bs)

    best, chain, _dts = _measure_chain(make_run)
    return best / chain


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
    from notorch_tpu.data.dense import pack_graphs_dense, plan_bins, pad_graphs_dense
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden, depth, tile = 256, 3, 8
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "lipo.csv")
    with open(path) as f:
        smis = [row["smiles"] for row in csv.DictReader(f)][:512]
    pipe = Pipeline(SmiToMol(), MolToGraph())
    graphs = [pipe(s) for s in smis]
    real_edges = sum(g.num_edges for g in graphs)
    key = jax.random.PRNGKey(0)

    dembed = DenseGraphEmbedding(42, 13, hidden_dim=hidden)
    dblock = DenseChempropBlock(hidden_dim=hidden, depth=depth)
    dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
    ev = dembed.init(key, dbg0)
    bv = dblock.init(key, dembed.apply(ev, dbg0))
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])

    V_b, E_b = 72, 128
    n_bins = len(plan_bins(graphs, V_b, E_b))
    n_bins = -(-n_bins // tile) * tile
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    G = dembed.apply(ev, pk)
    Gm = G.gather_matrix(jnp.float32)
    h0 = jnp.einsum("bev,bvd->bed", Gm, G.node_feats) + G.edge_feats
    emask = G.edge_mask.astype(jnp.float32)

    out = {}
    for variant in ["full", "no_swap", "no_A", "no_relu", "mm_only", "mW_only"]:
        try:
            dt = run_variant(variant, h0, G.src, G.dst, emask, Ws, bs, depth, tile)
            out[variant] = {
                "us_per_block": round(1e6 * dt, 1),
                "edges_per_sec": round(real_edges * depth / dt, 1),
            }
        except Exception as e:
            out[variant] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps({variant: out[variant]}), flush=True)


if __name__ == "__main__":
    main()

"""Sub-8 kernel tiles: Mosaic rejects ``pl.ds(i*tile, tile)`` on dim 0 when
tile < 8 ("cannot statically prove index is a multiple of 8"). Wide bins
(E_b=256, forced by full-lipo molecules) need tile 4 to fit scoped VMEM, so
probe the candidate index-array access patterns at (tile=4, E=256):

  P1 value_dslice — read src_ref[:] whole, jax.lax.dynamic_slice the VALUE
  P2 blocked_ints — reshape ints to [B/tile, tile, E], BlockSpec (1,tile,E)
  P3 aligned_read — pl.ds(8*(i*tile//8), 8) (provably 8-aligned), then
     select the tile rows from the 8 with an in-register one-hot matmul
     in f32 (int values < 2^24 are exact in f32)

Each: compile + exactness vs the jnp dense block, then a quick rate."""

from __future__ import annotations

import csv
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _arm_watchdog, _measure_chain  # noqa: E402


def main():
    import jax

    _arm_watchdog(3000)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.kernels.dense_mpnn import _edge_adjacency
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

    hidden, depth, tile = 256, 3, 4
    V_b, E_b = 136, 256
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

    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // 8) * 8
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    G = dembed.apply(ev, pk)
    h0 = (
        jnp.einsum("bev,bvd->bed", G.gather_matrix(jnp.float32), G.node_feats)
        + G.edge_feats
    )
    B, E, d = h0.shape
    emask = G.edge_mask.astype(jnp.float32)
    ref = dblock.apply(bv, G).edge_feats
    mask3 = G.edge_mask[..., None].astype(jnp.float32)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    def layers(h, A, w_ref, b_ref, mm):
        NB, E, d = h.shape
        for l in range(depth):
            m = jnp.maximum(h, 0.0)
            mW = jax.lax.dot_general(
                m.reshape(NB * E, d).astype(mm), w_ref[l].astype(mm),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(h.dtype).reshape(NB, E, d)
            out = b_ref[l][None, None, :] + jax.lax.dot_general(
                A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            h = h + out
        return h

    # ---- P1: value dynamic_slice --------------------------------------------
    def k_dslice(src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref, out_ref):
        i = pl.program_id(0)
        h = h_ref[:]
        row0 = i * tile
        src = jax.lax.dynamic_slice_in_dim(src_ref[:], row0, tile, 0)
        dst = jax.lax.dynamic_slice_in_dim(dst_ref[:], row0, tile, 0)
        em = jax.lax.dynamic_slice_in_dim(emask_ref[:], row0, tile, 0)
        A = _edge_adjacency(src, dst, em, h.dtype)
        out_ref[:] = layers(h, A, w_ref, b_ref, h.dtype)

    def call_dslice():
        return pl.pallas_call(
            k_dslice,
            grid=(B // tile,),
            in_specs=[
                whole((B, E)), whole((B, E)), whole((B, E)),
                pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                whole(tuple(Ws.shape)), whole(tuple(bs.shape)),
            ],
            out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
        )(G.src, G.dst, emask, h0, Ws, bs)

    # ---- P2: blocked int inputs ---------------------------------------------
    def k_blocked(src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref, out_ref):
        h = h_ref[:]
        A = _edge_adjacency(src_ref[0], dst_ref[0], emask_ref[0], h.dtype)
        out_ref[:] = layers(h, A, w_ref, b_ref, h.dtype)

    def call_blocked():
        src3 = G.src.reshape(B // tile, tile, E)
        dst3 = G.dst.reshape(B // tile, tile, E)
        em3 = emask.reshape(B // tile, tile, E)
        return pl.pallas_call(
            k_blocked,
            grid=(B // tile,),
            in_specs=[
                pl.BlockSpec((1, tile, E), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, tile, E), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, tile, E), lambda i: (i, 0, 0)),
                pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                whole(tuple(Ws.shape)), whole(tuple(bs.shape)),
            ],
            out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
        )(src3, dst3, em3, h0, Ws, bs)

    # ---- P3: 8-aligned read + one-hot row select ----------------------------
    def k_aligned(src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref, out_ref):
        i = pl.program_id(0)
        h = h_ref[:]
        row0 = i * tile
        base = 8 * (row0 // 8)
        src8 = src_ref[pl.ds(base, 8), :].astype(jnp.float32)
        dst8 = dst_ref[pl.ds(base, 8), :].astype(jnp.float32)
        em8 = emask_ref[pl.ds(base, 8), :]
        # select rows [row0-base, +tile) with a one-hot matmul (f32-exact)
        sel_rows = (row0 - base) + jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 0)
        sel_cols = jax.lax.broadcasted_iota(jnp.int32, (tile, 8), 1)
        sel = jnp.where(sel_rows == sel_cols, 1.0, 0.0)
        pick = lambda x: jax.lax.dot_general(
            sel, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        src = pick(src8).astype(jnp.int32)
        dst = pick(dst8).astype(jnp.int32)
        em = pick(em8)
        A = _edge_adjacency(src, dst, em, h.dtype)
        out_ref[:] = layers(h, A, w_ref, b_ref, h.dtype)

    def call_aligned():
        return pl.pallas_call(
            k_aligned,
            grid=(B // tile,),
            in_specs=[
                whole((B, E)), whole((B, E)), whole((B, E)),
                pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                whole(tuple(Ws.shape)), whole(tuple(bs.shape)),
            ],
            out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
        )(G.src, G.dst, emask, h0, Ws, bs)

    for tag, fn in [("value_dslice", call_dslice), ("blocked_ints", call_blocked),
                    ("aligned_onehot", call_aligned)]:
        rec = {"probe": tag, "tile": tile, "E_b": E_b}
        try:
            out = fn()
            rel = float(
                jnp.abs((out - ref) * mask3).max() / jnp.abs(ref * mask3).max()
            )
            rec["rel"] = round(rel, 5)
            if rel > 2e-2:
                rec["error"] = "correctness gate failed"
            else:
                # repeated-dispatch timing (compile cached after first call);
                # tunnel latency bounds this from below, fine for ranking
                import time

                float(jnp.sum(out))
                t0 = time.perf_counter()
                for _ in range(20):
                    out = fn()
                float(jnp.sum(out))
                dt = (time.perf_counter() - t0) / 20
                rec["fwd_edges_per_sec_dispatch"] = round(real_edges * depth / dt, 1)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:220]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

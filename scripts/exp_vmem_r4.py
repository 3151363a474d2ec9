"""Raise Mosaic's scoped-VMEM limit: do the E_b=256 bins / tile-16 stash
compile with ``vmem_limit_bytes`` above the 16MB default?

The round-3/4 compile failures were explicit: "Scoped allocation with size
22.55M and limit 16.00M exceeded scoped vmem limit" — 16MB is a COMPILER
default, not the chip (v5e has 128MB VMEM). This probes the fwd kernel at
(136, 256) bins and the stash train at tile 16 with the limit raised to
100MB, with parity gates, and times anything that compiles."""

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
    from jax.experimental.pallas import tpu as pltpu

    from notorch_tpu.data.dense import pack_graphs_dense, pad_graphs_dense, plan_bins
    from notorch_tpu.kernels.dense_mpnn import _block_kernel
    from notorch_tpu.nn.chemprop_dense import DenseChempropBlock, DenseGraphEmbedding
    from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

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
    dbg0 = pad_graphs_dense(graphs[:8], 64, 128)
    ev = dembed.init(key, dbg0)
    bv = dblock.init(key, dembed.apply(ev, dbg0))
    Ws = jnp.stack([bv["params"][f"layer_{i}"]["update"]["kernel"] for i in range(depth)])
    bs = jnp.stack([bv["params"][f"layer_{i}"]["update"]["bias"] for i in range(depth)])
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    def fwd_variant(V_b, E_b, tile, vmem_mb):
        rec = {"V_b": V_b, "E_b": E_b, "tile": tile, "vmem_mb": vmem_mb}
        try:
            n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // tile) * tile
            pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
            G = dembed.apply(ev, pk)
            h0 = (
                jnp.einsum(
                    "bev,bvd->bed", G.gather_matrix(jnp.float32), G.node_feats
                )
                + G.edge_feats
            )
            B, E, d = h0.shape
            emask = G.edge_mask.astype(jnp.float32)
            rec["density"] = round(real_edges / (n_bins * E_b), 3)

            kernel = functools.partial(
                _block_kernel, depth=depth, n_nodes=V_b, tile=tile, residual=True,
                mm_dtype=None,
            )
            kw = {}
            if vmem_mb:
                kw["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_mb * 1024 * 1024
                )
            call = pl.pallas_call(
                kernel,
                grid=(B // tile,),
                in_specs=[
                    whole((B, E)), whole((B, E)), whole((B, E)),
                    pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                    whole(tuple(Ws.shape)), whole(tuple(bs.shape)),
                ],
                out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
                **kw,
            )
            block = lambda h: call(G.src, G.dst, emask, h, Ws, bs)

            ref = dblock.apply(bv, G).edge_feats
            out = block(h0)
            mask = G.edge_mask[..., None].astype(jnp.float32)
            rel = float(jnp.abs((out - ref) * mask).max() / jnp.abs(ref * mask).max())
            rec["rel"] = round(rel, 5)
            if rel > 2e-2:
                rec["error"] = "correctness gate failed"
                return rec

            def make_run(chain):
                @jax.jit
                def run(h0):
                    return jnp.sum(
                        jax.lax.fori_loop(
                            0, chain, lambda _, h: block(h), h0
                        ).astype(jnp.float32)
                    )

                return lambda: run(h0)

            best, chain, _d = _measure_chain(make_run)
            rec["fwd_edges_per_sec"] = round(real_edges * depth * chain / best, 1)
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:250]
        return rec

    for V_b, E_b, tile, vmem in [
        (136, 256, 4, 100),
        (136, 256, 8, 100),
        (104, 192, 4, 100),
        (72, 128, 8, 100),  # does a raised limit change the prod shape at all?
    ]:
        print(json.dumps(fwd_variant(V_b, E_b, tile, vmem)), flush=True)


if __name__ == "__main__":
    main()

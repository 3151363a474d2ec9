"""Does declaring the fused-forward grid PARALLEL buy pipelining?

The fwd kernel runs a grid over independent molecule-bin tiles; Mosaic's
default treats grid dims as "arbitrary" (ordered). Marking the dim
"parallel" licenses more aggressive cross-tile DMA overlap. Measured
either way on the packed 512-mol lipo batch; the bwd kernels accumulate
weight grads across the grid and must stay ordered."""

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

    hidden, depth, tile = 256, 3, 8
    V_b, E_b = 72, 128
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

    n_bins = -(-len(plan_bins(graphs, V_b, E_b)) // tile) * tile
    pk = pack_graphs_dense(graphs, V_b, E_b, bin_cap=n_bins)
    G = dembed.apply(ev, pk)
    h0 = (
        jnp.einsum("bev,bvd->bed", G.gather_matrix(jnp.float32), G.node_feats)
        + G.edge_feats
    )
    B, E, d = h0.shape
    emask = G.edge_mask.astype(jnp.float32)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    def run_block(semantics):
        kernel = functools.partial(
            _block_kernel, depth=depth, n_nodes=V_b, tile=tile, residual=True,
            mm_dtype=None,
        )
        kw = {}
        if semantics is not None:
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=(semantics,)
            )
        call = pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[
                whole((B, E)),
                whole((B, E)),
                whole((B, E)),
                pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
                whole(tuple(Ws.shape)),
                whole(tuple(bs.shape)),
            ],
            out_specs=pl.BlockSpec((tile, E, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, E, d), h0.dtype),
            **kw,
        )
        return lambda h: call(G.src, G.dst, emask, h, Ws, bs)

    for tag, sem in [("default", None), ("parallel", "parallel"),
                     ("arbitrary", "arbitrary")]:
        try:
            block = run_block(sem)
            # parity vs default
            ref = run_block(None)(h0)
            out = block(h0)
            rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())

            def make_run(chain, block=block):
                @jax.jit
                def run(h0):
                    return jnp.sum(
                        jax.lax.fori_loop(
                            0, chain, lambda _, h: block(h), h0
                        ).astype(jnp.float32)
                    )

                return lambda: run(h0)

            best, chain, _d = _measure_chain(make_run)
            print(json.dumps({
                "semantics": tag, "rel_vs_default": round(rel, 7),
                "fwd_edges_per_sec": round(real_edges * depth * chain / best, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"semantics": tag,
                              "error": f"{type(e).__name__}: {e}"[:250]}),
                  flush=True)


if __name__ == "__main__":
    main()

"""Pallas padded-CSR segment-sum (SpMM) kernel for the flat edge layout.

The E->V reduction over dst-sorted edges, expressed as MXU work: the grid
runs (node tiles x edge chunks); the chunk base index for each node tile is
computed from prefetched row pointers (``PrefetchScalarGridSpec`` — the
block index maps read the scalar ref), and the within-chunk reduction is a
one-hot [TILE_V, TILE_E] matmul against the message chunk. Accumulation
happens across the inner grid dimension into the same output block.

This is the "Pallas SpMM over padded-CSR" path of the BASELINE north star
for the flat layout; the dense per-molecule layout has its own fused block
kernel (``kernels/dense_mpnn.py``).

STATUS: semantics verified in interpret mode (tests/test_csr_kernel.py);
the current remote Mosaic toolchain rejects PrefetchScalarGridSpec kernels
with an opaque compile error (HTTP 500, no diagnostic relayed), so on-TPU
use is gated behind the fused dense kernel for now. Measured context: the
XLA segment_sum scatter+gather round runs at ~63M edge-ops/s on v5e;
``indices_are_sorted`` makes no difference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _kernel(row_ptr_ref, dst_ref, data_ref, out_ref, *, tile_v: int, tile_e: int):
    i = pl.program_id(0)  # node tile
    j = pl.program_id(1)  # edge chunk within this tile's range

    v0 = i * tile_v
    start = row_ptr_ref[v0]
    end = row_ptr_ref[v0 + tile_v]

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # this chunk covers edges [chunk_lo, chunk_lo + tile_e) where chunk_lo is
    # aligned to tile_e (the index map selected block (start // tile_e) + j)
    chunk_lo = (start // tile_e + j) * tile_e

    @pl.when(chunk_lo < end)
    def _accumulate():
        dst = dst_ref[:]  # [tile_e]
        data = data_ref[:]  # [tile_e, d]
        e_ids = chunk_lo + jax.lax.broadcasted_iota(jnp.int32, (1, tile_e), 1)[0]
        valid = (e_ids >= start) & (e_ids < end)
        v_iota = v0 + jax.lax.broadcasted_iota(jnp.int32, (tile_v, tile_e), 0)
        M = jnp.where((dst[None, :] == v_iota) & valid[None, :], 1.0, 0.0).astype(
            data.dtype
        )
        out_ref[:] += jnp.dot(M, data, preferred_element_type=jnp.float32).astype(
            out_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes", "tile_v", "tile_e", "max_degree", "interpret"),
)
def csr_segment_sum(
    data: jnp.ndarray,  # [E, d] messages (dst-sorted)
    dst: jnp.ndarray,  # [E] i32 sorted
    row_ptr: jnp.ndarray,  # [V+1] i32
    num_nodes: int,
    tile_v: int = 128,
    tile_e: int = 256,
    max_degree: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum of dst-sorted ``data`` into ``[num_nodes, d]``."""
    E, d = data.shape
    if num_nodes % tile_v != 0:
        raise ValueError(f"num_nodes {num_nodes} must divide tile_v {tile_v}")
    if E % tile_e != 0:
        raise ValueError(f"num edges {E} must divide tile_e {tile_e}")
    # a tile's edge range spans at most tile_v*max_degree edges, plus up to
    # two partial chunks of misalignment
    max_chunks = (tile_v * max_degree) // tile_e + 2

    grid = (num_nodes // tile_v, max_chunks)

    # index maps receive (grid indices..., scalar prefetch refs...)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_e,), lambda i, j, rp: (rp[i * tile_v] // tile_e + j,)),
            pl.BlockSpec(
                (tile_e, d), lambda i, j, rp: (rp[i * tile_v] // tile_e + j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((tile_v, d), lambda i, j, rp: (i, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, tile_v=tile_v, tile_e=tile_e),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_nodes, d), data.dtype),
        interpret=interpret,
    )(row_ptr, dst, data)

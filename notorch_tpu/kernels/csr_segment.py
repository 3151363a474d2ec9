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

STATUS:
- ``csr_segment_sum`` (scalar-prefetch variant, below) remains TPU-gated:
  the remote Mosaic toolchain rejects PrefetchScalarGridSpec kernels with
  an opaque HTTP 500. Interpret-verified only.
- ``csr_segment_sum_packed`` (tile-packed variant) COMPILES AND RUNS on
  TPU: static block index maps (fixed edge budget per 128-node tile, packed
  host-side by :func:`pack_edges_by_tile`), int metadata shipped whole and
  ``pl.ds``-sliced in-kernel (blocked thin int inputs hit Mosaic tiling
  limits). Measured v5e (V=8k, E=32k, d=256, best-of-3): 140.8M edge-ops/s
  vs 92.7M for XLA segment_sum (1.52x). Differentiable via a custom VJP
  (backward = one masked dst-gather). Wired into the flat ChempropBlock as
  ``impl="csr"`` (DataLoader ``csr_pack=True`` / CLI ``model.impl: csr``);
  at block level the reduce is one of several hot ops, so end-to-end it is
  at parity with ``segment`` forward and backward.
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


# ---------------------------------------------------------------------------
# Tile-packed variant: STATIC block index maps (no scalar prefetch), so it
# compiles on toolchains that reject PrefetchScalarGridSpec. The edge array
# is repacked host-side so every tile_v-node tile owns a FIXED budget of
# edge slots (padding slots carry dst = -1); block (i, j) is then simply the
# (i * budget/tile_e + j)-th chunk — a static function of the grid indices.
# ---------------------------------------------------------------------------


def pack_edges_by_tile(
    dst,  # [E] i32, values in [0, num_nodes) (need NOT be sorted)
    num_nodes: int,
    tile_v: int = 128,
    budget: int | None = None,
):
    """Host-side packing: assign each edge a slot in its dst-tile's fixed
    budget. Returns ``(perm, packed_dst, budget)`` where ``perm[slot] = edge
    index`` (or -1 for padding) and ``packed_dst[slot] = dst`` (or -1).

    ``budget`` (edge slots per node tile) defaults to the max per-tile edge
    count rounded up to a multiple of 128. Raises if any tile overflows a
    given budget.
    """
    import numpy as np

    dst = np.asarray(dst)
    n_tiles = -(-num_nodes // tile_v)
    tile_of_edge = dst // tile_v
    counts = np.bincount(tile_of_edge, minlength=n_tiles)
    needed = int(counts.max()) if len(counts) else 0
    if budget is None:
        budget = max(128, -(-needed // 128) * 128)
    elif needed > budget:
        raise ValueError(f"tile edge count {needed} exceeds budget {budget}")

    order = np.argsort(tile_of_edge, kind="stable")
    perm = np.full(n_tiles * budget, -1, dtype=np.int32)
    packed_dst = np.full(n_tiles * budget, -1, dtype=np.int32)
    offset_in_tile = np.zeros(len(dst), dtype=np.int64)
    # running offset of each edge within its tile, in stable tile order
    sorted_tiles = tile_of_edge[order]
    starts = np.searchsorted(sorted_tiles, np.arange(n_tiles), side="left")
    for t in range(n_tiles):
        lo = starts[t]
        hi = starts[t + 1] if t + 1 < n_tiles else len(dst)
        offset_in_tile[order[lo:hi]] = np.arange(hi - lo)
    slots = tile_of_edge.astype(np.int64) * budget + offset_in_tile
    perm[slots] = np.arange(len(dst), dtype=np.int32)
    packed_dst[slots] = dst
    return perm, packed_dst, budget


def _packed_kernel(dst_ref, data_ref, out_ref, *, tile_v: int, tile_e: int, chunks: int):
    i = pl.program_id(0)  # node tile
    j = pl.program_id(1)  # edge chunk within this tile's budget

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # dst ships whole ([total_chunks, tile_e] in VMEM) and is sliced here —
    # blocked small-int inputs hit Mosaic tiling limits (see CLAUDE.md)
    dst = dst_ref[pl.ds(i * chunks + j, 1), :][0, :]  # [tile_e], -1 padding
    data = data_ref[:]  # [tile_e, d]
    v_iota = i * tile_v + jax.lax.broadcasted_iota(jnp.int32, (tile_v, tile_e), 0)
    M = jnp.where(dst[None, :] == v_iota, 1.0, 0.0).astype(data.dtype)
    out_ref[:] += jnp.dot(M, data, preferred_element_type=jnp.float32).astype(
        out_ref.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _csr_packed(data, perm, packed_dst, dst, edge_mask, num_nodes, tile_v, tile_e, interpret):
    return _csr_packed_impl(data, perm, packed_dst, num_nodes, tile_v, tile_e, interpret)


def _csr_packed_fwd(data, perm, packed_dst, dst, edge_mask, num_nodes, tile_v, tile_e, interpret):
    out = _csr_packed_impl(data, perm, packed_dst, num_nodes, tile_v, tile_e, interpret)
    return out, (dst, edge_mask, perm.shape, packed_dst.shape)


def _csr_packed_bwd(num_nodes, tile_v, tile_e, interpret, res, g):
    # segment-sum backward is one gather: d_data[e] = g[dst[e]] for real
    # (packed) edges, 0 for padding edges that were never packed
    import numpy as np

    dst, edge_mask, perm_shape, pdst_shape = res
    d_data = jnp.where(edge_mask[:, None], g[dst], 0.0)
    f0 = jax.dtypes.float0
    return (
        d_data,
        np.zeros(perm_shape, dtype=f0),
        np.zeros(pdst_shape, dtype=f0),
        np.zeros(dst.shape, dtype=f0),
        np.zeros(edge_mask.shape, dtype=f0),
    )


_csr_packed.defvjp(_csr_packed_fwd, _csr_packed_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "tile_v", "tile_e", "interpret")
)
def csr_segment_sum_packed(
    data: jnp.ndarray,  # [E, d] messages (any order)
    perm: jnp.ndarray,  # [T*budget] i32 slot -> edge index (-1 padding)
    packed_dst: jnp.ndarray,  # [T*budget] i32 (-1 padding)
    num_nodes: int,
    dst: jnp.ndarray | None = None,  # [E] i32 (for the VJP gather)
    edge_mask: jnp.ndarray | None = None,  # [E] bool (True = real edge)
    tile_v: int = 128,
    tile_e: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-sum via the tile-packed layout: one gather into packed slots,
    then a static-grid one-hot SpMM per node tile. ``perm``/``packed_dst``
    come from :func:`pack_edges_by_tile` (host, once per batch topology).
    Differentiable when ``dst``/``edge_mask`` are given (custom VJP — the
    backward is one masked dst-gather, same cost class as segment_sum's)."""
    E = data.shape[0]
    if dst is None:
        dst = jnp.zeros((E,), jnp.int32)
        edge_mask = jnp.zeros((E,), bool)
    elif edge_mask is None:
        edge_mask = jnp.ones((E,), bool)
    return _csr_packed(
        data, perm, packed_dst, dst, edge_mask, num_nodes, tile_v, tile_e, interpret
    )


def _csr_packed_impl(
    data, perm, packed_dst, num_nodes, tile_v, tile_e, interpret
) -> jnp.ndarray:
    E, d = data.shape
    n_slots = perm.shape[0]
    if num_nodes % tile_v != 0:
        raise ValueError(f"num_nodes {num_nodes} must be a multiple of {tile_v}")
    n_tiles = num_nodes // tile_v
    budget = n_slots // n_tiles
    if budget % tile_e != 0:
        raise ValueError(f"budget {budget} must be a multiple of tile_e {tile_e}")

    # gather messages into packed slots; padding slots read row E (zeros)
    ext = jnp.concatenate([data, jnp.zeros((1, d), data.dtype)], axis=0)
    slot_idx = jnp.where(perm >= 0, perm, E)
    packed = ext[slot_idx]  # [T*budget, d]

    chunks = budget // tile_e
    grid = (n_tiles, chunks)
    # Mosaic wants >=2-D refs: ship dst as [total_chunks, tile_e]
    dst2d = packed_dst.reshape(n_tiles * chunks, tile_e)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, tile_v=tile_v, tile_e=tile_e, chunks=chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(dst2d.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((tile_e, d), lambda i, j: (i * chunks + j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_v, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_nodes, d), data.dtype),
        interpret=interpret,
    )(dst2d, packed)
    return out


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

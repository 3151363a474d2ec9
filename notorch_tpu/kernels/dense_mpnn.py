"""Pallas TPU kernel: the fused dense-layout D-MPNN block.

The dense per-molecule layout (``notorch_tpu.data.dense``) already turns the
message-passing into batched MXU contractions; XLA still materializes each
layer's intermediates (messages, node sums, edge messages) in HBM. This
kernel runs the ENTIRE depth-D block for a tile of molecules with the edge
state resident in VMEM:

    HBM traffic = read h0 + read W[depth] + write h_final

i.e. one round trip of the edge tensor for the whole block, instead of
~4 per layer. The scatter/gather one-hot operators are built in-register
from src/dst with ``broadcasted_iota`` comparisons and consumed directly by
``dot_general`` on the MXU. The depth loop is unrolled statically (dynamic
indexing of the stacked weights stresses Mosaic), and the small integer
index arrays are passed whole (their tiles are sliced in-kernel), which
sidesteps the (8, 128) block-tiling constraint.

Forward-only (the jnp path remains the autodiff route); used for inference
and the edges/sec benchmark via
:func:`notorch_tpu.nn.chemprop_dense.fused_block_apply`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (for interpret mode)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _block_kernel(
    src_ref,  # [B, E] i32 (full array)
    dst_ref,  # [B, E] i32 (full array)
    emask_ref,  # [B, E] f32 (full array)
    h_ref,  # [NB, E, d] edge-hidden tile
    w_ref,  # [depth, d, d] (full)
    b_ref,  # [depth, d] (full)
    out_ref,  # [NB, E, d]
    *,
    depth: int,
    n_nodes: int,
    tile: int,
    residual: bool,
):
    i = pl.program_id(0)
    h = h_ref[:]
    NB, E, d = h.shape
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]

    v_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, n_nodes, E), 1)
    S = jnp.where(
        (dst[:, None, :] == v_iota) & (emask[:, None, :] > 0), 1.0, 0.0
    ).astype(h.dtype)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, E, n_nodes), 2)
    G = jnp.where(src[:, :, None] == g_iota, 1.0, 0.0).astype(h.dtype)

    def pair_swap(x):
        p = x.reshape(NB, E // 2, 2, d)
        swapped = jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2)
        return swapped.reshape(NB, E, d)

    for layer_idx in range(depth):  # static unroll
        m = jnp.maximum(h, 0.0)
        nm = jax.lax.dot_general(
            S, m, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(h.dtype)
        em = jax.lax.dot_general(
            G, nm, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(h.dtype) - pair_swap(m)
        W = w_ref[layer_idx]
        bb = b_ref[layer_idx]
        out = (
            jax.lax.dot_general(
                em.reshape(NB * E, d), W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            + bb[None, :]
        ).reshape(NB, E, d)
        h = h + out if residual else out

    out_ref[:] = h


@functools.partial(
    jax.jit,
    static_argnames=("depth", "n_nodes", "residual", "mols_per_tile", "interpret"),
)
def fused_dense_mpnn_block(
    edge_hiddens: jnp.ndarray,  # [B, E_m, d] initial edge hiddens
    src: jnp.ndarray,  # [B, E_m]
    dst: jnp.ndarray,  # [B, E_m]
    edge_mask: jnp.ndarray,  # [B, E_m] bool
    weights: jnp.ndarray,  # [depth, d, d]
    biases: jnp.ndarray,  # [depth, d]
    *,
    depth: int,
    n_nodes: int,
    residual: bool = True,
    mols_per_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the whole D-MPNN block; returns final edge hiddens [B, E_m, d]."""
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(edge_hiddens.dtype)

    kernel = functools.partial(
        _block_kernel, depth=depth, n_nodes=n_nodes, tile=NB, residual=residual
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[
            whole((B, E)),  # src (sliced per tile in-kernel)
            whole((B, E)),  # dst
            whole((B, E)),  # emask
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole(tuple(biases.shape)),
        ],
        out_specs=pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
        interpret=interpret,
    )(src, dst, emask, edge_hiddens, weights, biases)

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
``dot_general`` on the MXU.

Forward-only (jnp path remains the autodiff route); used for inference and
the edges/sec benchmark. Exposed through
:class:`notorch_tpu.nn.chemprop_dense.DenseChempropBlock` via
``use_pallas_inference``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (for interpret mode)
    from jax.experimental.pallas import tpu as pltpu

    _MEMORY_SPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMORY_SPACE = None


def _block_kernel(
    h_ref,  # [NB, E, d] in/out edge hiddens
    src_ref,  # [NB, E] i32
    dst_ref,  # [NB, E] i32
    emask_ref,  # [NB, E] f32 (1/0)
    w_ref,  # [depth, d, d]
    b_ref,  # [depth, d]
    out_ref,  # [NB, E, d]
    *,
    depth: int,
    n_nodes: int,
    residual: bool,
):
    h = h_ref[:]
    src = src_ref[:]
    dst = dst_ref[:]
    emask = emask_ref[:]
    NB, E, d = h.shape

    v_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, n_nodes, E), 1)
    # scatter one-hot S[b, v, e] = (dst[b, e] == v) & mask
    S = jnp.where(
        (dst[:, None, :] == v_iota) & (emask[:, None, :] > 0), 1.0, 0.0
    ).astype(h.dtype)
    # gather one-hot G[b, e, v] = (src[b, e] == v)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, E, n_nodes), 2)
    G = jnp.where(src[:, :, None] == g_iota, 1.0, 0.0).astype(h.dtype)

    def pair_swap(x):
        return x.reshape(NB, E // 2, 2, d)[:, :, ::-1].reshape(NB, E, d)

    def layer(i, h):
        m = jnp.maximum(h, 0.0)
        nm = jax.lax.dot_general(
            S, m, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(h.dtype)  # [NB, V, d]
        em = jax.lax.dot_general(
            G, nm, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(h.dtype) - pair_swap(m)
        W = w_ref[i]
        bb = b_ref[i]
        out = (
            jax.lax.dot_general(
                em.reshape(NB * E, d), W, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            + bb[None, :]
        ).reshape(NB, E, d)
        return h + out if residual else out

    h = jax.lax.fori_loop(0, depth, layer, h)
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
        _block_kernel, depth=depth, n_nodes=n_nodes, residual=residual
    )
    kwargs = {}
    if _MEMORY_SPACE is not None and not interpret:
        spec = lambda shape, idx: pl.BlockSpec(shape, idx, memory_space=_MEMORY_SPACE)
    else:
        spec = lambda shape, idx: pl.BlockSpec(shape, idx)

    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[
            spec((NB, E, d), lambda i: (i, 0, 0)),
            spec((NB, E), lambda i: (i, 0)),
            spec((NB, E), lambda i: (i, 0)),
            spec((NB, E), lambda i: (i, 0)),
            spec(weights.shape, lambda i: (0, 0, 0)),
            spec(biases.shape, lambda i: (0, 0)),
        ],
        out_specs=spec((NB, E, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
        interpret=interpret,
        **kwargs,
    )(edge_hiddens, src, dst, emask, weights, biases)

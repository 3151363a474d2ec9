"""Pallas TPU kernel: the fused dense-layout D-MPNN block.

The dense per-molecule layout (``notorch_tpu.data.dense``) already turns the
message-passing into batched MXU contractions; XLA still materializes each
layer's intermediates (messages, node sums, edge messages) in HBM. This
kernel runs the ENTIRE depth-D block for a tile of molecules with the edge
state resident in VMEM:

    HBM traffic = read h0 + read W[depth] + write h_final

i.e. one round trip of the edge tensor for the whole block, instead of
~4 per layer. The scatter→gather pair (E→V segment-sum then V→E gather)
is algebraically collapsed into ONE edge-to-edge operator
``A[e,e'] = [src(e) == dst(e')] * mask(e')`` built in-register with a
single VPU broadcast-compare (no one-hot matmuls), and the per-layer
update uses the permutation identity ``(A@m - swap(m)) @ W =
A@(mW) - swap(mW)`` so each layer is exactly two MXU contractions with
good shapes: ``[NB*E, d] @ [d, d]`` and batched ``[E, E] @ [E, d]``
(E >= 128, vs the naive form's two V~80-dim contractions). The depth
loop is unrolled statically (dynamic indexing of the stacked weights
stresses Mosaic), and the small integer index arrays are passed whole
(their tiles are sliced in-kernel), which sidesteps the (8, 128)
block-tiling constraint. ``matmul_dtype="bfloat16"`` casts only the
MXU operands (state stays f32 in VMEM/HBM — full-bf16 state measured
~3x slower on v5e, a whole-kernel layout effect).

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


def _edge_adjacency(src, dst, emask, mm_dtype):
    """``A[b,e,e'] = 1 iff src[e] == dst[e'] and e' is a real edge`` — the
    collapsed scatter+gather operator, built with one broadcast compare."""
    mask_ok = emask.astype(jnp.float32) > 0.0
    return jnp.where(
        (src[:, :, None] == dst[:, None, :]) & mask_ok[:, None, :], 1.0, 0.0
    ).astype(mm_dtype)


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
    mm_dtype,
):
    i = pl.program_id(0)
    h = h_ref[:]
    NB, E, d = h.shape
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]
    mm = h.dtype if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm)

    def pair_swap(x):
        p = x.reshape(NB, E // 2, 2, d)
        swapped = jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2)
        return swapped.reshape(NB, E, d)

    for layer_idx in range(depth):  # static unroll
        m = jnp.maximum(h, 0.0)
        W = w_ref[layer_idx]
        bb = b_ref[layer_idx]
        mW = (
            jax.lax.dot_general(
                m.reshape(NB * E, d).astype(mm), W.astype(mm),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            .astype(h.dtype)
            .reshape(NB, E, d)
        )
        out = (
            jax.lax.dot_general(
                A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            - pair_swap(mW)
            + bb[None, None, :]
        )
        h = h + out if residual else out

    out_ref[:] = h


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def fused_dense_mpnn_block_trainable(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Differentiable wrapper: Pallas forward, hand-written backward that
    replays the (cheap) forward in jnp to recover per-layer residuals — so
    the fused kernel is usable inside ``jax.grad`` training steps."""
    return fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )


def _jnp_forward_collect(h0, S, G, weights, biases, depth, residual):
    """Replay the recurrence in jnp, returning each layer's input hiddens."""
    def pair_swap(x):
        B, E = x.shape[:2]
        p = x.reshape(B, E // 2, 2, -1)
        return jnp.concatenate([p[:, :, 1:2], p[:, :, 0:1]], axis=2).reshape(x.shape)

    hs = [h0]
    h = h0
    for l in range(depth):
        m = jnp.maximum(h, 0.0)
        nm = jnp.einsum("bve,bed->bvd", S, m)
        em = jnp.einsum("bev,bvd->bed", G, nm) - pair_swap(m)
        out = em @ weights[l] + biases[l]
        h = h + out if residual else out
        hs.append(h)
    return hs


def _fused_fwd(edge_hiddens, src, dst, edge_mask, weights, biases,
               depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype):
    out = fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )
    return out, (edge_hiddens, src, dst, edge_mask, weights, biases)


def _fused_bwd(depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
               res, g):
    h0, src, dst, edge_mask, weights, biases = res
    B, E, d = h0.shape
    v_ids = jnp.arange(n_nodes)
    S = ((dst[:, None, :] == v_ids[None, :, None]) & edge_mask[:, None, :]).astype(
        h0.dtype
    )
    G = (src[:, :, None] == v_ids[None, None, :]).astype(h0.dtype)

    def pair_swap(x):
        p = x.reshape(B, E // 2, 2, -1)
        return jnp.concatenate([p[:, :, 1:2], p[:, :, 0:1]], axis=2).reshape(x.shape)

    hs = _jnp_forward_collect(h0, S, G, weights, biases, depth, residual)

    g_W = jnp.zeros_like(weights)
    g_b = jnp.zeros_like(biases)
    for l in reversed(range(depth)):
        h_in = hs[l]
        m = jnp.maximum(h_in, 0.0)
        nm = jnp.einsum("bve,bed->bvd", S, m)
        em = jnp.einsum("bev,bvd->bed", G, nm) - pair_swap(m)

        g_out = g
        g_W = g_W.at[l].add(jnp.einsum("bed,bef->df", em, g_out))
        g_b = g_b.at[l].add(g_out.sum(axis=(0, 1)))
        g_em = g_out @ weights[l].T
        g_nm = jnp.einsum("bev,bed->bvd", G, g_em)
        g_m = jnp.einsum("bve,bvd->bed", S, g_nm) - pair_swap(g_em)
        g_h = g_m * (h_in > 0)
        g = g_h + g_out if residual else g_h

    return g, None, None, None, g_W, g_b


fused_dense_mpnn_block_trainable.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_dense_mpnn_block_trainable_fast(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Like :func:`fused_dense_mpnn_block_trainable` but with the BACKWARD
    also running as a Pallas kernel (per-tile recompute + reverse sweep in
    VMEM). Note: bias gradients flow through the forward only via the
    additive path, identical to the jnp backward."""
    return fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )


def _fast_fwd(edge_hiddens, src, dst, edge_mask, weights, biases,
              depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype):
    out = fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )
    return out, (edge_hiddens, src, dst, edge_mask, weights)


def _fast_bwd(depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
              res, g):
    h0, src, dst, edge_mask, weights = res
    g_h0, g_W, g_b = fused_dense_mpnn_block_bwd(
        h0, src, dst, edge_mask, weights, g,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )
    return g_h0, None, None, None, g_W, g_b


# -- residual-stash variant ---------------------------------------------------
#
# The recompute backward spends 2(depth-1) matmuls per tile replaying the
# forward. This variant's FORWARD also writes each layer's input hiddens
# (h0..h_{depth-1}) to HBM; the backward reads them back instead of
# recomputing — trading depth extra [B, E, d] HBM round-trips for
# 2(depth-1) matmuls per tile. Which wins depends on where the kernel sits
# on the roofline; both are exposed and measured (scripts/exp_train_step.py).


def _block_kernel_stash(
    src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref,
    out_ref,  # [NB, E, d]
    hs_ref,  # [depth, NB, E, d] — layer INPUTS
    *, depth: int, n_nodes: int, tile: int, residual: bool, mm_dtype,
):
    i = pl.program_id(0)
    h = h_ref[:]
    NB, E, d = h.shape
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]
    mm = h.dtype if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm)

    def pair_swap(x):
        p = x.reshape(NB, E // 2, 2, d)
        swapped = jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2)
        return swapped.reshape(NB, E, d)

    for layer_idx in range(depth):
        hs_ref[layer_idx] = h
        m = jnp.maximum(h, 0.0)
        mW = (
            jax.lax.dot_general(
                m.reshape(NB * E, d).astype(mm), w_ref[layer_idx].astype(mm),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            .astype(h.dtype)
            .reshape(NB, E, d)
        )
        out = (
            jax.lax.dot_general(
                A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            - pair_swap(mW)
            + b_ref[layer_idx][None, None, :]
        )
        h = h + out if residual else out

    out_ref[:] = h


def _bwd_kernel_stash(
    src_ref, dst_ref, emask_ref,
    hs_ref,  # [depth, NB, E, d] stashed layer inputs
    w_ref, g_ref,
    gh_ref, gw_ref, gb_ref,
    *, depth: int, n_nodes: int, tile: int, residual: bool, mm_dtype,
):
    i = pl.program_id(0)
    NB, E, d = g_ref.shape
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]
    dt = g_ref.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm)

    def pair_swap(x):
        p = x.reshape(NB, E // 2, 2, d)
        return jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2).reshape(
            NB, E, d
        )

    @pl.when(i == 0)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    g = g_ref[:]
    for l in reversed(range(depth)):
        h_in = hs_ref[l]
        m = jnp.maximum(h_in, 0.0)
        g_mW = jax.lax.dot_general(
            A, g.astype(mm), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt) - pair_swap(g)
        gw_ref[l] += jax.lax.dot_general(
            m.reshape(NB * E, d).astype(mm), g_mW.reshape(NB * E, d).astype(mm),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gw_ref.dtype)
        gb_ref[l] += jnp.sum(g.reshape(NB * E, d), axis=0).astype(gb_ref.dtype)
        g_m = jax.lax.dot_general(
            g_mW.reshape(NB * E, d).astype(mm), w_ref[l].astype(mm),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt).reshape(NB, E, d)
        g_h = g_m * jnp.where(h_in > 0, 1.0, 0.0).astype(dt)
        g = g_h + g if residual else g_h

    gh_ref[:] = g


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret", "matmul_dtype"
    ),
)
def fused_dense_mpnn_block_stash(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    *, depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Forward that ALSO emits each layer's input hiddens.
    Returns (out [B, E, d], hs [depth, B, E, d])."""
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(jnp.float32)
    kernel = functools.partial(
        _block_kernel_stash, depth=depth, n_nodes=n_nodes, tile=NB,
        residual=residual, mm_dtype=matmul_dtype,
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[
            whole((B, E)),
            whole((B, E)),
            whole((B, E)),
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole(tuple(biases.shape)),
        ],
        out_specs=[
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((depth, NB, E, d), lambda i: (0, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
            jax.ShapeDtypeStruct((depth, B, E, d), edge_hiddens.dtype),
        ],
        interpret=interpret,
    )(src, dst, emask, edge_hiddens, weights, biases)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret", "matmul_dtype"
    ),
)
def fused_dense_mpnn_block_bwd_stash(
    hs,  # [depth, B, E, d] stashed layer inputs
    src, dst, edge_mask, weights, cotangent,
    *, depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Pallas backward consuming stashed residuals (no forward recompute).
    Returns (g_h0, g_W, g_b)."""
    _, B, E, d = hs.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(jnp.float32)
    kernel = functools.partial(
        _bwd_kernel_stash, depth=depth, n_nodes=n_nodes, tile=NB,
        residual=residual, mm_dtype=matmul_dtype,
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[
            whole((B, E)),
            whole((B, E)),
            whole((B, E)),
            pl.BlockSpec((depth, NB, E, d), lambda i: (0, i, 0, 0)),
            whole(tuple(weights.shape)),
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole((weights.shape[0], d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, E, d), cotangent.dtype),
            jax.ShapeDtypeStruct(tuple(weights.shape), weights.dtype),
            jax.ShapeDtypeStruct((weights.shape[0], d), weights.dtype),
        ],
        interpret=interpret,
    )(src, dst, emask, hs, weights, cotangent)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_dense_mpnn_block_trainable_stash(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Trainable fused block with the residual-stash backward: the forward
    writes per-layer inputs to HBM, the backward reads them back (3 matmuls
    per layer, no recompute)."""
    return fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )


def _stash_fwd(edge_hiddens, src, dst, edge_mask, weights, biases,
               depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype):
    out, hs = fused_dense_mpnn_block_stash(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )
    return out, (hs, src, dst, edge_mask, weights)


def _stash_bwd(depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
               res, g):
    hs, src, dst, edge_mask, weights = res
    g_h0, g_W, g_b = fused_dense_mpnn_block_bwd_stash(
        hs, src, dst, edge_mask, weights, g,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )
    return g_h0, None, None, None, g_W, g_b


fused_dense_mpnn_block_trainable_stash.defvjp(_stash_fwd, _stash_bwd)


# -- Pallas backward ---------------------------------------------------------


def _bwd_kernel(
    src_ref,  # [B, E] i32 (full)
    dst_ref,  # [B, E] i32 (full)
    emask_ref,  # [B, E] f32 (full)
    h0_ref,  # [NB, E, d] tile
    w_ref,  # [depth, d, d] (full)
    g_ref,  # [NB, E, d] cotangent tile
    gh_ref,  # out: [NB, E, d]
    gw_ref,  # out: [depth, d, d] (accumulated across tiles)
    gb_ref,  # out: [depth, d]
    *,
    depth: int,
    n_nodes: int,
    tile: int,
    residual: bool,
    mm_dtype,
):
    i = pl.program_id(0)
    h = h0_ref[:]
    NB, E, d = h.shape
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]
    mm = h.dtype if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm)

    def pair_swap(x):
        p = x.reshape(NB, E // 2, 2, d)
        return jnp.concatenate([p[:, :, 1:2, :], p[:, :, 0:1, :]], axis=2).reshape(
            NB, E, d
        )

    @pl.when(i == 0)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    # forward recompute, keeping each layer's INPUT (static depth). The
    # reverse sweep reads hs[0..depth-1] only, so the last layer's output
    # is never recomputed (2 matmuls saved per tile).
    hs = [h]
    for l in range(depth - 1):
        m = jnp.maximum(hs[l], 0.0)
        mW = jax.lax.dot_general(
            m.reshape(NB * E, d).astype(mm), w_ref[l].astype(mm),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype).reshape(NB, E, d)
        out = jax.lax.dot_general(
            A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype) - pair_swap(mW)
        hs.append(hs[l] + out if residual else out)

    g = g_ref[:]
    for l in reversed(range(depth)):
        h_in = hs[l]
        m = jnp.maximum(h_in, 0.0)
        # cotangent on mW: A^T @ g - swap(g)  (swap is its own transpose)
        g_mW = jax.lax.dot_general(
            A, g.astype(mm), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype) - pair_swap(g)
        # weight/bias grads: accumulate across tiles. g_W = m^T @ g_mW
        # (== em^T @ g of the naive form, since swap^T == swap)
        gw_ref[l] += jax.lax.dot_general(
            m.reshape(NB * E, d).astype(mm), g_mW.reshape(NB * E, d).astype(mm),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gw_ref.dtype)
        gb_ref[l] += jnp.sum(g.reshape(NB * E, d), axis=0).astype(gb_ref.dtype)

        g_m = jax.lax.dot_general(
            g_mW.reshape(NB * E, d).astype(mm), w_ref[l].astype(mm),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype).reshape(NB, E, d)
        g_h = g_m * jnp.where(h_in > 0, 1.0, 0.0).astype(h.dtype)
        g = g_h + g if residual else g_h

    gh_ref[:] = g


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret", "matmul_dtype"
    ),
)
def fused_dense_mpnn_block_bwd(
    edge_hiddens,  # [B, E, d] h0
    src,
    dst,
    edge_mask,
    weights,  # [depth, d, d]
    cotangent,  # [B, E, d]
    *,
    depth: int,
    n_nodes: int,
    residual: bool = True,
    mols_per_tile: int = 8,
    interpret: bool = False,
    matmul_dtype: str | None = None,
):
    """Pallas backward for the fused block: per-tile forward recompute +
    reverse sweep entirely in VMEM; weight grads accumulate across the
    (sequential) grid. Returns (g_h0, g_W, g_b)."""
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(jnp.float32)

    kernel = functools.partial(
        _bwd_kernel, depth=depth, n_nodes=n_nodes, tile=NB, residual=residual,
        mm_dtype=matmul_dtype,
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[
            whole((B, E)),
            whole((B, E)),
            whole((B, E)),
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole((weights.shape[0], d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
            jax.ShapeDtypeStruct(tuple(weights.shape), weights.dtype),
            jax.ShapeDtypeStruct((weights.shape[0], d), weights.dtype),
        ],
        interpret=interpret,
    )(src, dst, emask, edge_hiddens, weights, cotangent)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret", "matmul_dtype"
    ),
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
    matmul_dtype: str | None = None,
) -> jnp.ndarray:
    """Run the whole D-MPNN block; returns final edge hiddens [B, E_m, d].

    ``matmul_dtype``: cast MXU operands to this dtype (e.g. ``"bfloat16"``);
    accumulation and the VMEM-resident state stay in the input dtype.
    """
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(jnp.float32)

    kernel = functools.partial(
        _block_kernel, depth=depth, n_nodes=n_nodes, tile=NB, residual=residual,
        mm_dtype=matmul_dtype,
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


fused_dense_mpnn_block_trainable_fast.defvjp(_fast_fwd, _fast_bwd)

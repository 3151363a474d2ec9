"""Pallas TPU kernel: the fused dense-layout D-MPNN block.

The dense per-molecule layout (``notorch_tpu.data.dense``) already turns the
message-passing into batched MXU contractions; XLA still materializes each
layer's intermediates (messages, node sums, edge messages) in HBM. This
kernel runs the ENTIRE depth-D block for a tile of molecules with the edge
state resident in VMEM:

    HBM traffic = read h0 + read W[depth] + write h_final

i.e. one round trip of the edge tensor for the whole block, instead of
~4 per layer. The scatter→gather pair (E→V segment-sum then V→E gather)
AND the reverse-message subtraction are algebraically collapsed into ONE
edge-to-edge operator ``A[e,e'] = [src(e) == dst(e')] * mask(e') *
[e' != rev(e)]`` built in-register with broadcast compares (no one-hot
matmuls; see :func:`_edge_adjacency` for the fold's exactness argument),
and the per-layer update uses the permutation identity
``(A@m - swap(m)) @ W = (A - R)@(mW)`` so each layer is exactly two MXU
contractions with good shapes and NO elementwise shuffle serialized
between them: ``[NB*E, d] @ [d, d]`` and batched ``[E, E] @ [E, d]``
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


def _edge_adjacency(src, dst, emask, mm_dtype, mean: bool = False):
    """``A[b,e,e'] = 1 iff src[e] == dst[e'], e' is a real edge, AND
    e' != rev(e)`` — the collapsed scatter+gather operator with the
    reverse-message subtraction FOLDED IN. Under the interleaved pair
    layout ``rev(e) = e XOR 1``, and the rev diagonal of the unfolded
    operator is 1 exactly on real pairs (``dst(rev(e)) == src(e)``), so
    zeroing it deletes the naive form's per-layer ``- pair_swap(mW)``
    shuffle: each layer is ONE batched [E,E]@[E,d] MXU contraction with
    no elementwise chain serialized after it (round-3 ablation measured
    that chain at ~36% of block time). Built with broadcast compares in
    VMEM; never touches HBM.

    ``mean=True`` folds reduce='mean' message passing into the SAME
    operator: mean is linear, so A_mean[e,e'] = keep[e,e'] / indeg(src(e))
    minus the full rev diagonal (the jnp form subtracts the UNSCALED
    m[rev(e)] after the mean gather — reference
    ``notorch/nn/gnn/chemprop.py:25,39`` with ``torch_scatter`` mean). The
    in-degree is recovered in-register as the keep row-sum, so mean costs
    one VPU reduce + divide and ZERO extra matmuls.

    Contract: kernel outputs on PADDED edge lanes differ from the
    unfolded/jnp form (they no longer see the swap subtraction; for mean
    the rev diagonal is subtracted on padded rows too), and the backward
    treats cotangents as supported on real lanes only — every production
    consumer (masked scatter, masked readouts, masked losses) satisfies
    both."""
    NB, E = src.shape
    mask_ok = emask.astype(jnp.float32) > 0.0
    # the not-rev mask is bin-INDEPENDENT: build it [E, E] once and
    # broadcast, instead of materializing two [NB, E, E] int32 iotas —
    # at E=256 those were 2 MB of VMEM each, the margin between the
    # E_b>=192 bins compiling and the round-3 VMEM-class compile failures
    row = jax.lax.broadcasted_iota(jnp.int32, (E, E), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (E, E), 1)
    rev_row = row + 1 - 2 * (row % 2)
    keep = (src[:, :, None] == dst[:, None, :]) & mask_ok[:, None, :]
    if mean:
        keep_f = jnp.where(keep, 1.0, 0.0)
        indeg = jnp.sum(keep_f, axis=2, keepdims=True)  # [NB, E, 1] f32
        rev1 = jnp.where((col == rev_row)[None], 1.0, 0.0)
        return (keep_f / jnp.maximum(indeg, 1.0) - rev1).astype(mm_dtype)
    return jnp.where(keep & (col != rev_row)[None], 1.0, 0.0).astype(mm_dtype)


def _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked):
    """Per-tile (src, dst, emask) rows. ``blocked=False``: the arrays are
    passed WHOLE and pl.ds-sliced (requires tile % 8 == 0 — Mosaic must
    prove the dim-0 index is a multiple of 8). ``blocked=True``: the arrays
    arrive pre-reshaped [B/tile, tile, E] with (1, tile, E) BlockSpecs —
    the sub-8-tile path wide bins need (E_b=256 bins force tile 4 to fit
    scoped VMEM; probe: scripts/exp_tile4_r4.py)."""
    if blocked:
        return src_ref[0], dst_ref[0], emask_ref[0]
    row0 = i * tile
    return (
        src_ref[pl.ds(row0, NB), :],
        dst_ref[pl.ds(row0, NB), :],
        emask_ref[pl.ds(row0, NB), :],
    )


def _idx_operands(src, dst, emask, B, E, tile):
    """(in_specs_prefix, operands_prefix, blocked) for the index arrays."""
    if tile % 8 == 0:
        whole2 = pl.BlockSpec((B, E), lambda i: (0, 0))
        return [whole2, whole2, whole2], [src, dst, emask], False
    blk = pl.BlockSpec((1, tile, E), lambda i: (i, 0, 0))
    rs = lambda x: x.reshape(B // tile, tile, E)
    return [blk, blk, blk], [rs(src), rs(dst), rs(emask)], True



def fit_tile(tile: int, edges_per_bin: int, batch: int) -> int:
    """Shrink a requested bins-per-kernel-tile so (a) per-tile VMEM stays
    inside the measured-good envelope tile*E <= 8*128 (E_b=256 bins at the
    default tile 8 exceeded Mosaic's scoped budget — BASELINE.md round 4)
    and (b) the batch divides evenly. The blocking never changes the math;
    tile % 8 != 0 switches the index arrays to blocked form (_idx_operands).
    """
    while tile > 1 and tile * edges_per_bin > 8 * 128:
        tile //= 2
    while batch % tile != 0:
        tile //= 2
    return max(tile, 1)


def _block_kernel(
    src_ref,  # [B, E] i32 (full array) or [1, tile, E] block
    dst_ref,  # [B, E] i32 (full array) or [1, tile, E] block
    emask_ref,  # [B, E] f32 (full array) or [1, tile, E] block
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
    blocked_idx: bool = False,
    mean: bool = False,
):
    i = pl.program_id(0)
    h = h_ref[:]
    NB, E, d = h.shape
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)
    mm = h.dtype if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm, mean)

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
        # the reverse-message subtraction lives inside A (rev diagonal
        # zeroed) — no pair_swap shuffle between the two matmuls.
        # bias goes on the LEFT: Mosaic's ApplyVectorLayoutPass SIGABRTs
        # (Check failed: limits[i] <= dim(i)) when a broadcasted vector is
        # the RIGHT operand of an add whose left operand is a raw matmul
        # result (round-3 bisect; round 2 dodged it because pair_swap sat
        # in between)
        out = bb[None, None, :] + jax.lax.dot_general(
            A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = h + out if residual else out

    out_ref[:] = h


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12)
)
def fused_dense_mpnn_block_trainable(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    reduce: str = "sum",
):
    """Differentiable wrapper: Pallas forward, hand-written backward that
    replays the (cheap) forward in jnp to recover per-layer residuals — so
    the fused kernel is usable inside ``jax.grad`` training steps."""
    return fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
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
               depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
               reduce):
    out = fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
    )
    return out, (edge_hiddens, src, dst, edge_mask, weights, biases)


def _fused_bwd(depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
               reduce, res, g):
    h0, src, dst, edge_mask, weights, biases = res
    B, E, d = h0.shape
    v_ids = jnp.arange(n_nodes)
    S = ((dst[:, None, :] == v_ids[None, :, None]) & edge_mask[:, None, :]).astype(
        h0.dtype
    )
    G = (src[:, :, None] == v_ids[None, None, :]).astype(h0.dtype)
    if reduce == "mean":
        # scaled scatter: rows divided by real in-degree (the unscaled rev
        # subtraction stays a pair_swap below — matches _edge_adjacency)
        S = S / jnp.maximum(S.sum(axis=-1, keepdims=True), 1.0)

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_dense_mpnn_block_trainable_fast(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    reduce: str = "sum",
):
    """Like :func:`fused_dense_mpnn_block_trainable` but with the BACKWARD
    also running as a Pallas kernel (per-tile recompute + reverse sweep in
    VMEM). Note: bias gradients flow through the forward only via the
    additive path, identical to the jnp backward."""
    return fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
    )


def _fast_fwd(edge_hiddens, src, dst, edge_mask, weights, biases,
              depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
              reduce):
    out = fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
    )
    return out, (edge_hiddens, src, dst, edge_mask, weights, biases)


def _fast_bwd(depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
              reduce, res, g):
    h0, src, dst, edge_mask, weights, biases = res
    g_h0, g_W, g_b = fused_dense_mpnn_block_bwd(
        h0, src, dst, edge_mask, weights, biases, g,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
    )
    return g_h0, None, None, None, g_W, g_b


# -- residual-stash variant ---------------------------------------------------
#
# The recompute backward spends 2(depth-1) matmuls per tile replaying the
# forward. This variant's FORWARD also writes each HIDDEN layer's input
# (h1..h_{depth-1}) to HBM; the backward reads them back instead of
# recomputing — trading depth-1 extra [B, E, d] HBM round-trips for
# 2(depth-1) matmuls per tile. h0 is NOT stashed: it is already resident in
# HBM as the kernel input, so the backward reads the input tile directly
# (saves one full E-tensor write per step). ``stash_dtype="bfloat16"``
# halves the residual traffic further: the stash is cast on write and cast
# back to the compute dtype on read (gradients then carry ~bf16 rounding in
# the ReLU mask/weight-grad operand — opt-in, f32 default is exact). Which
# variant wins depends on where the kernel sits on the roofline; all are
# exposed and measured (scripts/bench_train_step.py).


def _block_kernel_stash(
    src_ref, dst_ref, emask_ref, h_ref, w_ref, b_ref,
    out_ref,  # [NB, E, d]
    hs_ref,  # [depth-1, NB, E, d] — HIDDEN layer inputs h1..h_{depth-1}
    *, depth: int, n_nodes: int, tile: int, residual: bool, mm_dtype,
    blocked_idx: bool = False, mean: bool = False,
):
    i = pl.program_id(0)
    h = h_ref[:]
    NB, E, d = h.shape
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)
    mm = h.dtype if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm, mean)

    for layer_idx in range(depth):
        if layer_idx > 0:  # h0 is the kernel input — never re-stashed
            hs_ref[layer_idx - 1] = h.astype(hs_ref.dtype)
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
        # bias on the LEFT of the matmul result — see _block_kernel
        out = b_ref[layer_idx][None, None, :] + jax.lax.dot_general(
            A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = h + out if residual else out

    out_ref[:] = h


def _bwd_kernel_stash(
    src_ref, dst_ref, emask_ref,
    h0_ref,  # [NB, E, d] the original kernel input (layer-0 input)
    hs_ref,  # [depth-1, NB, E, d] stashed hidden-layer inputs h1..h_{depth-1}
    w_ref, g_ref,
    gh_ref, gw_ref, gb_ref,
    *, depth: int, n_nodes: int, tile: int, residual: bool, mm_dtype,
    blocked_idx: bool = False, mean: bool = False,
):
    i = pl.program_id(0)
    NB, E, d = g_ref.shape
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)
    dt = g_ref.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm, mean)

    @pl.when(i == 0)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    g = g_ref[:]
    for l in reversed(range(depth)):
        # compare/multiply in the compute dtype (bf16 stash is cast back)
        h_in = (h0_ref[:] if l == 0 else hs_ref[l - 1]).astype(dt)
        m = jnp.maximum(h_in, 0.0)
        # the fold's VJP is one matmul too: g_mW = A'^T @ g (the swap term
        # is inside A'; exact because cotangents are zero on padded lanes)
        g_mW = jax.lax.dot_general(
            A, g.astype(mm), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
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
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret",
        "matmul_dtype", "stash_dtype", "reduce",
    ),
)
def fused_dense_mpnn_block_stash(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    *, depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    stash_dtype: str | None = None, reduce: str = "sum",
):
    """Forward that ALSO emits each HIDDEN layer's input (h1..h_{depth-1};
    h0 is the kernel input and is never duplicated).
    Returns (out [B, E, d], hs [depth-1, B, E, d] or None when depth == 1).
    ``stash_dtype`` stores the residuals down-cast (e.g. "bfloat16")."""
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    if depth == 1:  # nothing to stash — backward needs only h0
        out = fused_dense_mpnn_block(
            edge_hiddens, src, dst, edge_mask, weights, biases,
            depth=depth, n_nodes=n_nodes, residual=residual,
            mols_per_tile=mols_per_tile, interpret=interpret,
            matmul_dtype=matmul_dtype, reduce=reduce,
        )
        return out, None
    emask = edge_mask.astype(jnp.float32)
    sdt = edge_hiddens.dtype if stash_dtype is None else jnp.dtype(stash_dtype)
    idx_specs, idx_ops, blocked = _idx_operands(src, dst, emask, B, E, NB)
    kernel = functools.partial(
        _block_kernel_stash, depth=depth, n_nodes=n_nodes, tile=NB,
        residual=residual, mm_dtype=matmul_dtype, blocked_idx=blocked,
        mean=reduce == "mean",
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=idx_specs + [
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole(tuple(biases.shape)),
        ],
        out_specs=[
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((depth - 1, NB, E, d), lambda i: (0, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
            jax.ShapeDtypeStruct((depth - 1, B, E, d), sdt),
        ],
        interpret=interpret,
    )(*idx_ops, edge_hiddens, weights, biases)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret",
        "matmul_dtype", "reduce",
    ),
)
def fused_dense_mpnn_block_bwd_stash(
    h0,  # [B, E, d] the forward's input (layer-0 input, read back from HBM)
    hs,  # [depth-1, B, E, d] stashed hidden-layer inputs (None iff depth == 1)
    src, dst, edge_mask, weights, cotangent,
    *, depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    reduce: str = "sum",
):
    """Pallas backward consuming stashed residuals (no forward recompute).
    Returns (g_h0, g_W, g_b)."""
    B, E, d = h0.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    if depth == 1:  # no stash exists; recompute backward does zero replay
        return fused_dense_mpnn_block_bwd(
            h0, src, dst, edge_mask, weights,
            jnp.zeros((1, h0.shape[-1]), h0.dtype), cotangent,
            depth=depth, n_nodes=n_nodes, residual=residual,
            mols_per_tile=mols_per_tile, interpret=interpret,
            matmul_dtype=matmul_dtype, reduce=reduce,
        )
    emask = edge_mask.astype(jnp.float32)
    idx_specs, idx_ops, blocked = _idx_operands(src, dst, emask, B, E, NB)
    kernel = functools.partial(
        _bwd_kernel_stash, depth=depth, n_nodes=n_nodes, tile=NB,
        residual=residual, mm_dtype=matmul_dtype, blocked_idx=blocked,
        mean=reduce == "mean",
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=idx_specs + [
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((depth - 1, NB, E, d), lambda i: (0, i, 0, 0)),
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
    )(*idx_ops, h0, hs, weights, cotangent)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def fused_dense_mpnn_block_trainable_stash(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    stash_dtype: str | None = None, reduce: str = "sum",
):
    """Trainable fused block with the residual-stash backward: the forward
    writes hidden-layer inputs to HBM (h0 is never duplicated — the backward
    reads the original input), the backward reads them back (3 matmuls per
    layer, no recompute). ``stash_dtype="bfloat16"`` halves the stash
    traffic at the cost of bf16 rounding in the recovered residuals."""
    return fused_dense_mpnn_block(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
    )


def _stash_fwd(edge_hiddens, src, dst, edge_mask, weights, biases,
               depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
               stash_dtype, reduce):
    out, hs = fused_dense_mpnn_block_stash(
        edge_hiddens, src, dst, edge_mask, weights, biases,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, stash_dtype=stash_dtype, reduce=reduce,
    )
    return out, (edge_hiddens, hs, src, dst, edge_mask, weights)


def _stash_bwd(depth, n_nodes, residual, mols_per_tile, interpret, matmul_dtype,
               stash_dtype, reduce, res, g):
    h0, hs, src, dst, edge_mask, weights = res
    g_h0, g_W, g_b = fused_dense_mpnn_block_bwd_stash(
        h0, hs, src, dst, edge_mask, weights, g,
        depth=depth, n_nodes=n_nodes, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype, reduce=reduce,
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
    b_ref,  # [depth, d] (full) — the replay needs the biases
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
    blocked_idx: bool = False,
    mean: bool = False,
):
    i = pl.program_id(0)
    h = h0_ref[:]
    NB, E, d = h.shape
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)
    mm = h.dtype if mm_dtype is None else jnp.dtype(mm_dtype)

    A = _edge_adjacency(src, dst, emask, mm, mean)

    @pl.when(i == 0)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    # forward recompute, keeping each layer's INPUT (static depth). The
    # reverse sweep reads hs[0..depth-1] only, so the last layer's output
    # is never recomputed (2 matmuls saved per tile). The replay MUST add
    # the per-layer bias: omitting it (as before round 3) silently skewed
    # every relu mask and weight grad once trained biases left zero —
    # zero-init biases in the tests masked it.
    hs = [h]
    for l in range(depth - 1):
        m = jnp.maximum(hs[l], 0.0)
        mW = jax.lax.dot_general(
            m.reshape(NB * E, d).astype(mm), w_ref[l].astype(mm),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype).reshape(NB, E, d)
        # bias on the LEFT of the matmul result — see _block_kernel
        out = b_ref[l][None, None, :].astype(h.dtype) + jax.lax.dot_general(
            A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        hs.append(hs[l] + out if residual else out)

    g = g_ref[:]
    for l in reversed(range(depth)):
        h_in = hs[l]
        m = jnp.maximum(h_in, 0.0)
        # cotangent on mW: A'^T @ g — the swap term is folded into A'
        # (exact because cotangents are zero on padded lanes)
        g_mW = jax.lax.dot_general(
            A, g.astype(mm), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        # weight/bias grads: accumulate across tiles. g_W = m^T @ g_mW
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
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret",
        "matmul_dtype", "reduce",
    ),
)
def fused_dense_mpnn_block_bwd(
    edge_hiddens,  # [B, E, d] h0
    src,
    dst,
    edge_mask,
    weights,  # [depth, d, d]
    biases,  # [depth, d]
    cotangent,  # [B, E, d]
    *,
    depth: int,
    n_nodes: int,
    residual: bool = True,
    mols_per_tile: int = 8,
    interpret: bool = False,
    matmul_dtype: str | None = None,
    reduce: str = "sum",
):
    """Pallas backward for the fused block: per-tile forward recompute +
    reverse sweep entirely in VMEM; weight grads accumulate across the
    (sequential) grid. Returns (g_h0, g_W, g_b)."""
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(jnp.float32)

    idx_specs, idx_ops, blocked = _idx_operands(src, dst, emask, B, E, NB)
    kernel = functools.partial(
        _bwd_kernel, depth=depth, n_nodes=n_nodes, tile=NB, residual=residual,
        mm_dtype=matmul_dtype, blocked_idx=blocked, mean=reduce == "mean",
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=idx_specs + [
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole((weights.shape[0], d)),
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
    )(*idx_ops, edge_hiddens, weights, biases, cotangent)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret",
        "matmul_dtype", "reduce",
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
    reduce: str = "sum",
) -> jnp.ndarray:
    """Run the whole D-MPNN block; returns final edge hiddens [B, E_m, d].

    ``matmul_dtype``: cast MXU operands to this dtype (e.g. ``"bfloat16"``);
    accumulation and the VMEM-resident state stay in the input dtype.
    ``reduce``: "sum" or "mean" — mean folds into the edge operator (see
    :func:`_edge_adjacency`) at zero extra matmuls.
    """
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    emask = edge_mask.astype(jnp.float32)

    idx_specs, idx_ops, blocked = _idx_operands(src, dst, emask, B, E, NB)
    kernel = functools.partial(
        _block_kernel, depth=depth, n_nodes=n_nodes, tile=NB, residual=residual,
        mm_dtype=matmul_dtype, blocked_idx=blocked, mean=reduce == "mean",
    )
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=idx_specs + [
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole(tuple(biases.shape)),
        ],
        out_specs=pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
        interpret=interpret,
    )(*idx_ops, edge_hiddens, weights, biases)


fused_dense_mpnn_block_trainable_fast.defvjp(_fast_fwd, _fast_bwd)


# -- v3: whole-encoder fusion --------------------------------------------------
#
# The block kernel still leaves three XLA ops around itself per call: the
# initial V->E gather (h0 = G @ node_feats + edge_feats), the final masked
# E->V scatter (node_hiddens = S @ h), and the HBM materialization of the
# [B, E, V] / [B, V, E] one-hot operators those einsums consume. This
# variant moves BOTH ends into the kernel: the one-hots are built in
# VMEM with a broadcast compare against an iota (never touching HBM), h0
# lives only in registers/VMEM, and the kernel's HBM I/O shrinks to
#   read node_feats + read edge_feats + write node_hiddens +
#   write edge_hiddens (+ the depth-1 residual stash for training).
# The backward recomputes h0 from (node_feats, edge_feats) — one matmul —
# instead of stashing it, and emits gradients for BOTH feature inputs.


def _encoder_body(
    src_ref, dst_ref, emask_ref, nf_ref, ef_ref, w_ref, b_ref,
    nh_ref, eh_ref, hs_ref,
    *, depth: int, tile: int, residual: bool, mm_dtype, mean: bool = False,
):
    i = pl.program_id(0)
    nf = nf_ref[:]
    NB, V, d = nf.shape
    E = ef_ref.shape[1]
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]
    dt = ef_ref.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)

    # gather one-hot G[e, v] = [src(e) == v] (unmasked — matches
    # DenseBatchedGraph.gather_matrix), built in VMEM
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, E, V), 2)
    G = jnp.where(src[:, :, None] == v_iota, 1.0, 0.0).astype(mm)
    h = (
        jax.lax.dot_general(
            G, nf.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        + ef_ref[:]
    )

    A = _edge_adjacency(src, dst, emask, mm, mean)

    for layer_idx in range(depth):
        if hs_ref is not None and layer_idx > 0:
            hs_ref[layer_idx - 1] = h.astype(hs_ref.dtype)
        m = jnp.maximum(h, 0.0)
        mW = (
            jax.lax.dot_general(
                m.reshape(NB * E, d).astype(mm), w_ref[layer_idx].astype(mm),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            .astype(dt)
            .reshape(NB, E, d)
        )
        # bias on the LEFT of the matmul result — see _block_kernel
        out = b_ref[layer_idx][None, None, :] + jax.lax.dot_general(
            A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        h = h + out if residual else out

    eh_ref[:] = h
    # masked scatter one-hot, stored transposed: St[e, v] = [dst(e) == v and
    # e real] (matches DenseBatchedGraph.scatter_matrix)
    # mask multiply in f32: Mosaic rejects minor-dim insertion on i1
    # vectors (bool [NB, E] -> [NB, E, 1]), so never broadcast the bool
    St = (
        jnp.where(dst[:, :, None] == v_iota, 1.0, 0.0)
        * emask.astype(jnp.float32)[:, :, None]
    )
    if mean:  # final E->V reduce divides by real in-degree (floor 1)
        St = St / jnp.maximum(jnp.sum(St, axis=1, keepdims=True), 1.0)
    St = St.astype(mm)
    nh_ref[:] = jax.lax.dot_general(
        St, h.astype(mm), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(nh_ref.dtype)


def _encoder_kernel(src, dst, emask, nf, ef, w, b, nh, eh, **kw):
    _encoder_body(src, dst, emask, nf, ef, w, b, nh, eh, None, **kw)


def _encoder_kernel_stash(src, dst, emask, nf, ef, w, b, nh, eh, hs, **kw):
    _encoder_body(src, dst, emask, nf, ef, w, b, nh, eh, hs, **kw)


def _encoder_bwd_kernel(
    src_ref, dst_ref, emask_ref, nf_ref, ef_ref, hs_ref, w_ref,
    gn_ref, ge_ref,
    gnf_ref, gef_ref, gw_ref, gb_ref,
    *, depth: int, tile: int, residual: bool, mm_dtype, mean: bool = False,
):
    i = pl.program_id(0)
    nf = nf_ref[:]
    NB, V, d = nf.shape
    E = ge_ref.shape[1]
    row0 = i * tile
    src = src_ref[pl.ds(row0, NB), :]
    dst = dst_ref[pl.ds(row0, NB), :]
    emask = emask_ref[pl.ds(row0, NB), :]
    dt = ge_ref.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)

    v_iota = jax.lax.broadcasted_iota(jnp.int32, (NB, E, V), 2)
    G = jnp.where(src[:, :, None] == v_iota, 1.0, 0.0).astype(mm)
    # mask multiply in f32: Mosaic rejects minor-dim insertion on i1
    # vectors (bool [NB, E] -> [NB, E, 1]), so never broadcast the bool
    St = (
        jnp.where(dst[:, :, None] == v_iota, 1.0, 0.0)
        * emask.astype(jnp.float32)[:, :, None]
    )
    if mean:  # the final scatter's VJP uses the SAME scaled operator
        St = St / jnp.maximum(jnp.sum(St, axis=1, keepdims=True), 1.0)
    St = St.astype(mm)
    A = _edge_adjacency(src, dst, emask, mm, mean)

    @pl.when(i == 0)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gb_ref[:] = jnp.zeros_like(gb_ref)

    # h0 is recomputed (one matmul) rather than stashed: cheaper than an
    # extra write+read of a full edge tensor
    h0 = (
        jax.lax.dot_general(
            G, nf.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        + ef_ref[:]
    )

    # cotangent on the final edge hiddens: the scatter's VJP folds in here
    # (g_h += St @ g_node along V)
    g = ge_ref[:] + jax.lax.dot_general(
        St, gn_ref[:].astype(mm), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)

    for l in reversed(range(depth)):
        h_in = (h0 if l == 0 else hs_ref[l - 1]).astype(dt)
        m = jnp.maximum(h_in, 0.0)
        g_mW = jax.lax.dot_general(
            A, g.astype(mm), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
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

    gef_ref[:] = g
    # gather's VJP: g_node_feats[v] = sum_e [src(e) == v] g_h0[e]
    gnf_ref[:] = jax.lax.dot_general(
        G, g.astype(mm), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(gnf_ref.dtype)


def _encoder_bwd_kernel_d1(
    src_ref, dst_ref, emask_ref, nf_ref, ef_ref, w_ref,
    gn_ref, ge_ref, gnf_ref, gef_ref, gw_ref, gb_ref,
    *, depth: int, tile: int, residual: bool, mm_dtype, mean: bool = False,
):
    _encoder_bwd_kernel(
        src_ref, dst_ref, emask_ref, nf_ref, ef_ref, None, w_ref,
        gn_ref, ge_ref, gnf_ref, gef_ref, gw_ref, gb_ref,
        depth=depth, tile=tile, residual=residual, mm_dtype=mm_dtype, mean=mean,
    )


def _encoder_tile(mols_per_tile: int, B: int) -> int:
    NB = min(mols_per_tile, B)
    if B % NB != 0:
        raise ValueError(f"batch {B} not divisible by mols_per_tile {NB}")
    return NB


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "residual", "mols_per_tile", "interpret", "matmul_dtype",
        "stash_dtype", "stash", "reduce",
    ),
)
def fused_dense_encoder_fwd(
    node_feats, edge_feats, src, dst, edge_mask, weights, biases,
    *, depth: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    stash_dtype: str | None = None, stash: bool = False, reduce: str = "sum",
):
    """One-kernel encoder: gather + depth-D block + masked scatter.
    Returns (node_hiddens [B, V, d], edge_hiddens [B, E, d], hs) where hs is
    the [depth-1, B, E, d] residual stash when ``stash`` (None otherwise)."""
    B, V, d = node_feats.shape
    E = edge_feats.shape[1]
    NB = _encoder_tile(mols_per_tile, B)
    emask = edge_mask.astype(jnp.float32)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    want_stash = stash and depth > 1
    kernel = functools.partial(
        _encoder_kernel_stash if want_stash else _encoder_kernel,
        depth=depth, tile=NB, residual=residual, mm_dtype=matmul_dtype,
        mean=reduce == "mean",
    )
    out_specs = [
        pl.BlockSpec((NB, V, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, V, d), node_feats.dtype),
        jax.ShapeDtypeStruct((B, E, d), edge_feats.dtype),
    ]
    if want_stash:
        sdt = edge_feats.dtype if stash_dtype is None else jnp.dtype(stash_dtype)
        out_specs.append(pl.BlockSpec((depth - 1, NB, E, d), lambda i: (0, i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((depth - 1, B, E, d), sdt))
    res = pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=[
            whole((B, E)),
            whole((B, E)),
            whole((B, E)),
            pl.BlockSpec((NB, V, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole(tuple(biases.shape)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(src, dst, emask, node_feats, edge_feats, weights, biases)
    if want_stash:
        return res[0], res[1], res[2]
    return res[0], res[1], None


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "residual", "mols_per_tile", "interpret", "matmul_dtype", "reduce",
    ),
)
def fused_dense_encoder_bwd(
    node_feats, edge_feats, hs, src, dst, edge_mask, weights,
    g_node, g_edge,
    *, depth: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    reduce: str = "sum",
):
    """Pallas backward of the whole-encoder kernel.
    Returns (g_node_feats, g_edge_feats, g_W, g_b)."""
    B, V, d = node_feats.shape
    E = edge_feats.shape[1]
    NB = _encoder_tile(mols_per_tile, B)
    emask = edge_mask.astype(jnp.float32)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    in_specs = [
        whole((B, E)),
        whole((B, E)),
        whole((B, E)),
        pl.BlockSpec((NB, V, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
    ]
    operands = [src, dst, emask, node_feats, edge_feats]
    if depth > 1:
        in_specs.append(pl.BlockSpec((depth - 1, NB, E, d), lambda i: (0, i, 0, 0)))
        operands.append(hs)
        kernel_fn = _encoder_bwd_kernel
    else:
        kernel_fn = _encoder_bwd_kernel_d1
    in_specs += [
        whole(tuple(weights.shape)),
        pl.BlockSpec((NB, V, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
    ]
    operands += [weights, g_node, g_edge]
    kernel = functools.partial(
        kernel_fn, depth=depth, tile=NB, residual=residual,
        mm_dtype=matmul_dtype, mean=reduce == "mean",
    )
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((NB, V, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, E, d), lambda i: (i, 0, 0)),
            whole(tuple(weights.shape)),
            whole((weights.shape[0], d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V, d), node_feats.dtype),
            jax.ShapeDtypeStruct((B, E, d), edge_feats.dtype),
            jax.ShapeDtypeStruct(tuple(weights.shape), weights.dtype),
            jax.ShapeDtypeStruct((weights.shape[0], d), weights.dtype),
        ],
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def fused_dense_encoder(
    node_feats, edge_feats, src, dst, edge_mask, weights, biases,
    depth: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    stash_dtype: str | None = None, reduce: str = "sum",
):
    """Trainable whole-encoder fusion: (node_feats, edge_feats) ->
    (node_hiddens, edge_hiddens) in ONE Pallas kernel each way. The forward
    stashes hidden-layer inputs (h1..h_{depth-1}) for the backward; h0 is
    recomputed from the feature inputs (one matmul) rather than stashed."""
    nh, eh, _ = fused_dense_encoder_fwd(
        node_feats, edge_feats, src, dst, edge_mask, weights, biases,
        depth=depth, residual=residual, mols_per_tile=mols_per_tile,
        interpret=interpret, matmul_dtype=matmul_dtype, stash=False,
        reduce=reduce,
    )
    return nh, eh


def _enc_fwd(node_feats, edge_feats, src, dst, edge_mask, weights, biases,
             depth, residual, mols_per_tile, interpret, matmul_dtype, stash_dtype,
             reduce):
    nh, eh, hs = fused_dense_encoder_fwd(
        node_feats, edge_feats, src, dst, edge_mask, weights, biases,
        depth=depth, residual=residual, mols_per_tile=mols_per_tile,
        interpret=interpret, matmul_dtype=matmul_dtype,
        stash_dtype=stash_dtype, stash=True, reduce=reduce,
    )
    return (nh, eh), (node_feats, edge_feats, hs, src, dst, edge_mask, weights)


def _enc_bwd(depth, residual, mols_per_tile, interpret, matmul_dtype, stash_dtype,
             reduce, res, gs):
    node_feats, edge_feats, hs, src, dst, edge_mask, weights = res
    g_node, g_edge = gs
    g_nf, g_ef, g_W, g_b = fused_dense_encoder_bwd(
        node_feats, edge_feats, hs, src, dst, edge_mask, weights, g_node, g_edge,
        depth=depth, residual=residual, mols_per_tile=mols_per_tile,
        interpret=interpret, matmul_dtype=matmul_dtype, reduce=reduce,
    )
    return g_nf, g_ef, None, None, None, g_W, g_b


fused_dense_encoder.defvjp(_enc_fwd, _enc_bwd)


# -- manually double-buffered forward -----------------------------------------
#
# The round-5 phase decomposition (scripts/exp_fwd_phases_r5.py) measured the
# production forward at full == IO + matmuls SERIAL: the matmul chain runs at
# MXU peak (203 TFLOP/s) and the A-build hides under it, but the ~53us tile
# IO does not overlap compute (tile-16 probe: the floor is true HBM traffic,
# not per-step overhead). This variant owns the h-tile DMAs: the h input and
# out output live in ANY/HBM memory space, and each grid step processes TWO
# tiles with STATICALLY-NAMED double buffers (slot-dynamic VMEM indexing is
# a known Mosaic hazard on this toolchain), so every tile's load/store
# overlaps the neighboring tile's matmul chain.

try:
    _SEM_DMA = pltpu.SemaphoreType.DMA if pltpu is not None else None
except Exception:  # pragma: no cover
    _SEM_DMA = None


def _dbuf_compute(h, src, dst, emask, w_ref, b_ref, depth, residual, mm, mean):
    A = _edge_adjacency(src, dst, emask, mm, mean)
    NB, E, d = h.shape
    for l in range(depth):
        m = jnp.maximum(h, 0.0)
        mW = jax.lax.dot_general(
            m.reshape(NB * E, d).astype(mm), w_ref[l].astype(mm),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype).reshape(NB, E, d)
        out = b_ref[l][None, None, :] + jax.lax.dot_general(
            A, mW.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = h + out if residual else out
    return h


def _dbuf_kernel(
    src_ref, dst_ref, emask_ref, w_ref, b_ref,  # VMEM (whole)
    h_hbm, out_hbm,  # ANY (manual DMA)
    bufA, bufB, outA, outB,  # VMEM scratch
    semA, semB, osemA, osemB,  # DMA semaphores
    *, depth: int, tile: int, n_tiles: int, residual: bool, mm_dtype, mean: bool,
):
    j = pl.program_id(0)  # handles tiles 2j (A) and 2j+1 (B)
    NB = tile
    dt = bufA.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)

    def in_copy(t, buf, sem):
        return pltpu.make_async_copy(h_hbm.at[pl.ds(t * NB, NB)], buf, sem)

    def out_copy(t, buf, sem):
        return pltpu.make_async_copy(buf, out_hbm.at[pl.ds(t * NB, NB)], sem)

    @pl.when(j == 0)
    def _prologue():
        in_copy(0, bufA, semA).start()
        in_copy(1, bufB, semB).start()

    # ---- tile 2j (slot A) ----
    tA = 2 * j
    row0 = tA * NB
    srcA = src_ref[pl.ds(row0, NB), :]
    dstA = dst_ref[pl.ds(row0, NB), :]
    emA = emask_ref[pl.ds(row0, NB), :]
    in_copy(tA, bufA, semA).wait()
    hA = _dbuf_compute(bufA[:], srcA, dstA, emA, w_ref, b_ref, depth, residual,
                       mm, mean)
    @pl.when(j > 0)
    def _():
        # outA still draining tile 2j-2's store
        out_copy(2 * j - 2, outA, osemA).wait()
    outA[:] = hA
    out_copy(tA, outA, osemA).start()
    @pl.when(tA + 2 < n_tiles)
    def _():
        in_copy(tA + 2, bufA, semA).start()  # overlaps tile 2j+1's compute

    # ---- tile 2j+1 (slot B) ----
    tB = 2 * j + 1
    row1 = tB * NB
    srcB = src_ref[pl.ds(row1, NB), :]
    dstB = dst_ref[pl.ds(row1, NB), :]
    emB = emask_ref[pl.ds(row1, NB), :]
    in_copy(tB, bufB, semB).wait()
    hB = _dbuf_compute(bufB[:], srcB, dstB, emB, w_ref, b_ref, depth, residual,
                       mm, mean)
    @pl.when(j > 0)
    def _():
        out_copy(2 * j - 1, outB, osemB).wait()
    outB[:] = hB
    out_copy(tB, outB, osemB).start()
    @pl.when(tB + 2 < n_tiles)
    def _():
        in_copy(tB + 2, bufB, semB).start()

    @pl.when(j == (n_tiles // 2) - 1)
    def _epilogue():
        out_copy(2 * j, outA, osemA).wait()
        out_copy(2 * j + 1, outB, osemB).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "n_nodes", "residual", "mols_per_tile", "interpret",
        "matmul_dtype", "reduce",
    ),
)
def fused_dense_mpnn_block_dbuf(
    edge_hiddens, src, dst, edge_mask, weights, biases,
    *, depth: int, n_nodes: int, residual: bool = True, mols_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    reduce: str = "sum",
):
    """Forward with manually double-buffered tile IO. Requires the batch to
    split into an even number of multiple-of-8 tiles; callers fall back to
    :func:`fused_dense_mpnn_block` otherwise."""
    B, E, d = edge_hiddens.shape
    NB = min(mols_per_tile, B)
    if NB % 8 != 0 or B % (2 * NB) != 0:
        raise ValueError(
            f"dbuf kernel needs an even count of multiple-of-8 tiles "
            f"(B={B}, tile={NB}); use fused_dense_mpnn_block"
        )
    n_tiles = B // NB
    emask = edge_mask.astype(jnp.float32)
    whole = lambda shape: pl.BlockSpec(shape, lambda j: tuple(0 for _ in shape))
    kernel = functools.partial(
        _dbuf_kernel, depth=depth, tile=NB, n_tiles=n_tiles, residual=residual,
        mm_dtype=matmul_dtype, mean=reduce == "mean",
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles // 2,),
        in_specs=[
            whole((B, E)), whole((B, E)), whole((B, E)),
            whole(tuple(weights.shape)), whole(tuple(biases.shape)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, E, d), edge_hiddens.dtype),
        scratch_shapes=[
            pltpu.VMEM((NB, E, d), edge_hiddens.dtype),
            pltpu.VMEM((NB, E, d), edge_hiddens.dtype),
            pltpu.VMEM((NB, E, d), edge_hiddens.dtype),
            pltpu.VMEM((NB, E, d), edge_hiddens.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(src, dst, emask, weights, biases, edge_hiddens)

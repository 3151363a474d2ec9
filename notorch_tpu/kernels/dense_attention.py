"""Pallas TPU kernel: fused edge-biased graph attention over dense bins.

The dense-packed graph transformer (``nn/attention_dense.py``) already turns
the attention layer into batched MXU contractions, but XLA materializes the
[B, H, V, V] scores/softmax/alpha tensors in HBM each way — round 4 measured
train 5.8x under its own forward (28.0M vs 161.2M edge-updates/s) with ~27%
of the step in the bias VJP alone. This kernel runs the ATTENTION CORE for a
tile of bins with everything resident in VMEM:

    HBM traffic = read q,k,v,eb + write out      (forward)
                + read g_out + write g_q/g_k/g_v/g_eb   (backward)

i.e. the [V, V] score/alpha tensors never touch HBM. The node-node mask and
the per-edge additive bias are built IN VMEM from ``src``/``dst`` with
broadcast-iota compares (the same one-hot operators as the fused D-MPNN
kernel — packed bins need no extra mask because per-molecule node-id ranges
are disjoint), the masked softmax streams per head, and the backward
RECOMPUTES alpha per tile (2.5 matmuls/head) instead of stashing the
[B, H, V, V] tensor to HBM, with the bias VJP fused as one matmul + one
masked row-reduction per head.

The q/k/v/o projections and the FFN stay in XLA — they are plain matmuls
XLA already runs at MXU speed (the v3 whole-encoder experiment showed
in-kernel projection matmuls don't pay; BASELINE.md round 2).

Semantics match :class:`notorch_tpu.nn.attention_dense.DenseGraphSelfAttention`
(and therefore the flat :class:`notorch_tpu.nn.attention.GraphSelfAttention`)
exactly. Reference spec: ``notorch/nn/gnn/attention.py:42`` (edge-biased
multi-head self-attention; NameError-broken there, SURVEY §2.4).

Mosaic notes (hazards measured in earlier rounds, see CLAUDE.md): the head
loop is static; per-head q/k/v slices are static lax slices of VMEM values;
the bool mask is compared in f32 and never minor-dim-broadcast as i1; the
edge-bias rides as [B, H, E] so its minor dim is lane-aligned.

STATUS (round 5, measured-closed — BASELINE.md): every kernel generation
here (v1 heads-in-loop, v2 head-in-grid, hybrid XLA-fwd/Pallas-bwd) is
parity-exact on chip but SLOWER end to end than XLA's einsum machinery at
the production shapes (V=128, dh=64) — this Mosaic toolchain charges
~0.5-1us fixed cost per vector op per grid step, which dominates
small-tile kernels. The production attention path is the jnp module with
the factored bias-scatter VJP + custom masked-softmax VJP
(``nn/attention_dense.py`` — the two XLA-level levers the kernel
decompositions exposed; +32% train). The kernels stay for comparison and
regression gating.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from notorch_tpu.kernels.dense_mpnn import _idx_operands, _read_idx

__all__ = ["fused_dense_attention", "fit_attn_tile"]


def fit_attn_tile(tile: int, nodes_per_bin: int, edges_per_bin: int, batch: int) -> int:
    """Shrink a requested bins-per-kernel-tile so per-tile VMEM stays inside
    the envelope (the [V, V] per-head score tensors plus the [E, V] one-hot
    operators are the big residents) and the batch divides evenly."""
    # budget heuristic: V*V + 2*E*V + 4*V*d transients per bin; at the
    # production shape (V=128, E=256, d=256) tile 4 lands ~7 MB (tile 8
    # fails the Mosaic remote compile — HTTP 500, round-5 probe)
    while tile > 1 and tile * max(edges_per_bin, nodes_per_bin) > 4 * 256:
        tile //= 2
    while batch % tile != 0:
        tile //= 2
    return max(tile, 1)


def _onehot_ops(src, dst, emask, V, mm):
    """In-VMEM one-hot operators: G[b,e,v] = [src==v] (gather),
    St[b,e,v] = [dst==v]*mask (masked scatter, transposed), and the
    node-node mask M = St^T G (M[b,i,j] = #real edges j->i)."""
    NB, E = src.shape
    viota = jax.lax.broadcasted_iota(jnp.int32, (NB, E, V), 2)
    G = jnp.where(src[:, :, None] == viota, 1.0, 0.0).astype(mm)
    # mask multiply in f32 — Mosaic rejects minor-dim insertion on i1
    St = (
        jnp.where(dst[:, :, None] == viota, 1.0, 0.0)
        * emask.astype(jnp.float32)[:, :, None]
    ).astype(mm)
    M = jax.lax.dot_general(
        St, G, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [NB, V, V]
    return G, St, M


def _head_alpha(q, k, St, G, eb_h, mask, h, dh, mm, dt):
    """Recompute one head's attention weights: biased masked softmax.
    Returns (alpha [NB, V, V], q_h, k_h)."""
    NB, V, d = q.shape
    q_h = jax.lax.slice(q, (0, 0, h * dh), (NB, V, (h + 1) * dh))
    k_h = jax.lax.slice(k, (0, 0, h * dh), (NB, V, (h + 1) * dh))
    scores = jax.lax.dot_general(
        q_h.astype(mm), k_h.astype(mm), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(dh))
    if eb_h is not None:
        bias = jax.lax.dot_general(
            (St.astype(jnp.float32) * eb_h[:, :, None]).astype(mm), G,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores + bias
    neg = jnp.where(mask, scores, -1e30)
    mx = jnp.max(neg, axis=-1, keepdims=True)
    ex = jnp.where(mask, jnp.exp(neg - mx), 0.0)
    alpha = (ex / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-12)).astype(dt)
    return alpha, q_h, k_h


def _attn_kernel(
    src_ref,  # [B, E] i32 (whole) or [1, tile, E] block
    dst_ref,
    emask_ref,  # f32
    q_ref,  # [NB, V, d]
    k_ref,
    v_ref,
    eb_ref,  # [NB, H, E] per-edge additive bias (None-shaped when absent)
    out_ref,  # [NB, V, d]
    *,
    num_heads: int,
    tile: int,
    edge_bias: bool,
    mm_dtype,
    blocked_idx: bool,
):
    i = pl.program_id(0)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    NB, V, d = q.shape
    dh = d // num_heads
    dt = q.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)

    G, St, M = _onehot_ops(src, dst, emask, V, mm)
    mask = M > 0.0
    eb = eb_ref[:] if edge_bias else None

    outs = []
    for h in range(num_heads):  # static unroll
        eb_h = eb[:, h, :].astype(jnp.float32) if edge_bias else None
        alpha, _, _ = _head_alpha(q, k, St, G, eb_h, mask, h, dh, mm, dt)
        v_h = jax.lax.slice(v, (0, 0, h * dh), (NB, V, (h + 1) * dh))
        out_h = jax.lax.dot_general(
            alpha.astype(mm), v_h.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        outs.append(out_h)
    out_ref[:] = jnp.concatenate(outs, axis=-1)


def _attn_bwd_kernel(
    src_ref, dst_ref, emask_ref,
    q_ref, k_ref, v_ref, eb_ref,
    g_ref,  # [NB, V, d] cotangent on the pre-W_o output
    gq_ref, gk_ref, gv_ref, geb_ref,
    *,
    num_heads: int,
    tile: int,
    edge_bias: bool,
    mm_dtype,
    blocked_idx: bool,
):
    i = pl.program_id(0)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    NB, V, d = q.shape
    dh = d // num_heads
    dt = q.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)

    G, St, M = _onehot_ops(src, dst, emask, V, mm)
    mask = M > 0.0
    eb = eb_ref[:] if edge_bias else None

    gqs, gks, gvs, gebs = [], [], [], []
    for h in range(num_heads):  # static unroll
        eb_h = eb[:, h, :].astype(jnp.float32) if edge_bias else None
        alpha, q_h, k_h = _head_alpha(q, k, St, G, eb_h, mask, h, dh, mm, dt)
        v_h = jax.lax.slice(v, (0, 0, h * dh), (NB, V, (h + 1) * dh))
        g_h = jax.lax.slice(g, (0, 0, h * dh), (NB, V, (h + 1) * dh))

        # combine VJP: g_alpha[i,j] = g_h[i]·v_h[j];  g_v[j] = Σ_i α[i,j] g_h[i]
        g_alpha = jax.lax.dot_general(
            g_h.astype(mm), v_h.astype(mm), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        gvs.append(
            jax.lax.dot_general(
                alpha.astype(mm), g_h.astype(mm), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dt)
        )
        # softmax VJP (alpha is 0 on masked lanes, so no explicit mask)
        af = alpha.astype(jnp.float32)
        tmp = af * g_alpha
        g_s = (tmp - af * jnp.sum(tmp, axis=-1, keepdims=True)).astype(dt)

        gqs.append(
            (
                jax.lax.dot_general(
                    g_s.astype(mm), k_h.astype(mm), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                * (1.0 / math.sqrt(dh))
            ).astype(dt)
        )
        gks.append(
            (
                jax.lax.dot_general(
                    g_s.astype(mm), q_h.astype(mm), (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                * (1.0 / math.sqrt(dh))
            ).astype(dt)
        )
        if edge_bias:
            # bias VJP, fused: g_eb[e] = Σ_ij St[e,i] g_s[i,j] G[e,j]
            #                          = rowsum_j( (St·g_s)[e,j] * G[e,j] )
            T = jax.lax.dot_general(
                St, g_s.astype(mm), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [NB, E, V(j)]
            gebs.append(jnp.sum(T * G.astype(jnp.float32), axis=-1)[:, None, :])

    gq_ref[:] = jnp.concatenate(gqs, axis=-1)
    gk_ref[:] = jnp.concatenate(gks, axis=-1)
    gv_ref[:] = jnp.concatenate(gvs, axis=-1)
    if edge_bias:
        geb_ref[:] = jnp.concatenate(gebs, axis=1).astype(geb_ref.dtype)
    else:
        geb_ref[:] = jnp.zeros_like(geb_ref)


def _common_call(q, eb, src, dst, edge_mask, num_heads, bins_per_tile):
    B, V, d = q.shape
    E = src.shape[1]
    if d % num_heads != 0:
        raise ValueError(f"hidden dim {d} not divisible by num_heads {num_heads}")
    NB = fit_attn_tile(min(bins_per_tile, B), V, E, B)
    emask = edge_mask.astype(jnp.float32)
    idx_specs, idx_ops, blocked = _idx_operands(src, dst, emask, B, E, NB)
    edge_bias = eb is not None
    if not edge_bias:  # dummy operand keeps the kernel signature static
        eb = jnp.zeros((B, num_heads, E), q.dtype)
    return B, V, d, E, NB, idx_specs, idx_ops, blocked, edge_bias, eb


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "bins_per_tile", "interpret", "matmul_dtype"),
)
def fused_dense_attention_fwd(
    q, k, v, eb, src, dst, edge_mask,
    *, num_heads: int, bins_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Attention core forward: (q, k, v [B, V, d], eb [B, H, E] or None) ->
    pre-W_o output [B, V, d]. Mask/bias built in VMEM from src/dst."""
    B, V, d, E, NB, idx_specs, idx_ops, blocked, edge_bias, eb = _common_call(
        q, eb, src, dst, edge_mask, num_heads, bins_per_tile
    )
    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, tile=NB, edge_bias=edge_bias,
        mm_dtype=matmul_dtype, blocked_idx=blocked,
    )
    tile3 = lambda w: pl.BlockSpec((NB, w, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=idx_specs + [
            tile3(V), tile3(V), tile3(V),
            pl.BlockSpec((NB, num_heads, E), lambda i: (i, 0, 0)),
        ],
        out_specs=tile3(V),
        out_shape=jax.ShapeDtypeStruct((B, V, d), q.dtype),
        interpret=interpret,
    )(*idx_ops, q, k, v, eb)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "bins_per_tile", "interpret", "matmul_dtype"),
)
def fused_dense_attention_bwd(
    q, k, v, eb, src, dst, edge_mask, cotangent,
    *, num_heads: int, bins_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Recompute backward: returns (g_q, g_k, g_v, g_eb)."""
    B, V, d, E, NB, idx_specs, idx_ops, blocked, edge_bias, eb = _common_call(
        q, eb, src, dst, edge_mask, num_heads, bins_per_tile
    )
    kernel = functools.partial(
        _attn_bwd_kernel, num_heads=num_heads, tile=NB, edge_bias=edge_bias,
        mm_dtype=matmul_dtype, blocked_idx=blocked,
    )
    tile3 = lambda w: pl.BlockSpec((NB, w, d), lambda i: (i, 0, 0))
    eb_spec = pl.BlockSpec((NB, num_heads, E), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B // NB,),
        in_specs=idx_specs + [tile3(V), tile3(V), tile3(V), eb_spec, tile3(V)],
        out_specs=[tile3(V), tile3(V), tile3(V), eb_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, V, d), q.dtype),
            jax.ShapeDtypeStruct((B, V, d), q.dtype),
            jax.ShapeDtypeStruct((B, V, d), q.dtype),
            jax.ShapeDtypeStruct((B, num_heads, E), q.dtype),
        ],
        interpret=interpret,
    )(*idx_ops, q, k, v, eb, cotangent)


def _jnp_attention_core(q, k, v, eb, src, dst, edge_mask, num_heads):
    """The XLA forward (same math as DenseGraphSelfAttention's jnp path,
    with the bias scatter as one 3-operand einsum). Measured FASTER than
    the Pallas forward on v5e (XLA's batched einsums reach ~119 TFLOP/s on
    these shapes; the per-head kernel matmuls do not — round-5 decomposition,
    scripts/exp_attn_decomp_r5.py), so the hybrid keeps it."""
    B, V, d = q.shape
    H = num_heads
    dh = d // H
    v_ids = jnp.arange(V)
    S = ((dst[:, None, :] == v_ids[None, :, None]) & edge_mask[:, None, :]).astype(
        q.dtype
    )  # [B, V, E]
    Gm = (src[:, :, None] == v_ids[None, None, :]).astype(q.dtype)  # [B, E, V]
    M = jnp.einsum("bie,bej->bij", S, Gm)
    qh = q.reshape(B, V, H, dh)
    kh = k.reshape(B, V, H, dh)
    vh = v.reshape(B, V, H, dh)
    scores = jnp.einsum("bihd,bjhd->bhij", qh, kh) / jnp.sqrt(float(dh))
    if eb is not None:
        scores = scores + jnp.einsum("bie,bhe,bej->bhij", S, eb, Gm)
    mask = (M > 0)[:, None, :, :]
    neg = jnp.where(mask, scores, -jnp.inf)
    mx = jnp.max(neg, axis=-1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(mask, jnp.exp(neg - mx), 0.0)
    alpha = ex / jnp.maximum(ex.sum(axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bhij,bjhd->bihd", alpha, vh).reshape(B, V, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_dense_attention(
    q, k, v, eb, src, dst, edge_mask,
    num_heads: int, bins_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
    fwd_impl: str = "jnp",
):
    """Trainable attention core with the Pallas recompute BACKWARD (the
    [B, H, V, V] alpha/score tensors never hit HBM on the backward, and the
    bias VJP is fused in-kernel). ``fwd_impl`` picks the forward: "jnp"
    (default — XLA's einsum forward measured faster than the Pallas forward
    at the production shapes) or "pallas" (single kernel, minimal HBM: for
    HBM-constrained serving). ``eb`` is the per-edge additive score bias
    laid out [B, H, E], or None."""
    if fwd_impl == "pallas":
        return fused_dense_attention_fwd_v2(
            q, k, v, eb, src, dst, edge_mask,
            num_heads=num_heads, bins_per_tile=bins_per_tile,
            interpret=interpret, matmul_dtype=matmul_dtype,
        )
    return _jnp_attention_core(q, k, v, eb, src, dst, edge_mask, num_heads)


def _fda_fwd(q, k, v, eb, src, dst, edge_mask,
             num_heads, bins_per_tile, interpret, matmul_dtype, fwd_impl):
    out = fused_dense_attention(
        q, k, v, eb, src, dst, edge_mask,
        num_heads, bins_per_tile, interpret, matmul_dtype, fwd_impl,
    )
    return out, (q, k, v, eb, src, dst, edge_mask)


def _fda_bwd(num_heads, bins_per_tile, interpret, matmul_dtype, fwd_impl, res, g):
    q, k, v, eb, src, dst, edge_mask = res
    g_q, g_k, g_v, g_eb = fused_dense_attention_bwd_v2(
        q, k, v, eb, src, dst, edge_mask, g,
        num_heads=num_heads, bins_per_tile=bins_per_tile,
        interpret=interpret, matmul_dtype=matmul_dtype,
    )
    return g_q, g_k, g_v, (g_eb if eb is not None else None), None, None, None


fused_dense_attention.defvjp(_fda_fwd, _fda_bwd)


# -- v2: head-in-grid layout ---------------------------------------------------
#
# v1 sliced per-head [V, dh=64] operands out of [NB, V, d] VMEM values —
# sub-128-lane minor-dim slices that force Mosaic relayouts; the v1 kernel
# measured ~55x off its matmul roofline (992us fwd vs ~18us of MXU work,
# round-5 decomposition). v2 moves the head axis INTO the pallas grid:
# operands arrive as [1, NB, V, dh] blocks of a [H, B, V, dh] transpose
# (XLA does the transposes outside), so every in-kernel tensor is whole and
# lane-aligned, and each grid step handles one (bin-tile, head) pair. The
# one-hot operators are rebuilt per step (VPU-cheap); all matmuls have
# K in {dh, V, E} with V/E lane-aligned.


def _idx_operands2(src, dst, emask, B, E, tile):
    """2D-grid version of dense_mpnn._idx_operands (index maps take (i, h))."""
    if tile % 8 == 0:
        whole2 = pl.BlockSpec((B, E), lambda i, h: (0, 0))
        return [whole2, whole2, whole2], [src, dst, emask], False
    blk = pl.BlockSpec((1, tile, E), lambda i, h: (i, 0, 0))
    rs = lambda x: x.reshape(B // tile, tile, E)
    return [blk, blk, blk], [rs(src), rs(dst), rs(emask)], True


def _head_scores_v2(qh, kh, St, G, ebh, mask, dh, mm):
    scores = jax.lax.dot_general(
        qh.astype(mm), kh.astype(mm), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(dh))
    if ebh is not None:
        scores = scores + jax.lax.dot_general(
            (St.astype(jnp.float32) * ebh[:, :, None]).astype(mm), G,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    neg = jnp.where(mask, scores, -1e30)
    mx = jnp.max(neg, axis=-1, keepdims=True)
    ex = jnp.where(mask, jnp.exp(neg - mx), 0.0)
    return ex / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-12)


def _attn_kernel_v2(
    src_ref, dst_ref, emask_ref,
    qh_ref, kh_ref, vh_ref,  # [1, NB, V, dh] blocks of [H, B, V, dh]
    ebh_ref,  # [NB, 1, E] block of [B, H, E]
    out_ref,  # [1, NB, V, dh]
    *, tile: int, dh: int, edge_bias: bool, mm_dtype, blocked_idx: bool,
):
    i = pl.program_id(0)
    qh = qh_ref[0]
    kh = kh_ref[0]
    vh = vh_ref[0]
    NB, V, _ = qh.shape
    dt = qh.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)
    G, St, M = _onehot_ops(src, dst, emask, V, mm)
    mask = M > 0.0
    ebh = ebh_ref[0].astype(jnp.float32) if edge_bias else None
    alpha = _head_scores_v2(qh, kh, St, G, ebh, mask, dh, mm).astype(dt)
    out_ref[0] = jax.lax.dot_general(
        alpha.astype(mm), vh.astype(mm), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)


def _attn_bwd_kernel_v2(
    src_ref, dst_ref, emask_ref,
    qh_ref, kh_ref, vh_ref, ebh_ref, gh_ref,
    gq_ref, gk_ref, gv_ref, geb_ref,
    *, tile: int, dh: int, edge_bias: bool, mm_dtype, blocked_idx: bool,
):
    i = pl.program_id(0)
    qh = qh_ref[0]
    kh = kh_ref[0]
    vh = vh_ref[0]
    gh = gh_ref[0]
    NB, V, _ = qh.shape
    dt = qh.dtype
    mm = dt if mm_dtype is None else jnp.dtype(mm_dtype)
    src, dst, emask = _read_idx(src_ref, dst_ref, emask_ref, i, NB, tile, blocked_idx)
    G, St, M = _onehot_ops(src, dst, emask, V, mm)
    mask = M > 0.0
    ebh = ebh_ref[0].astype(jnp.float32) if edge_bias else None

    alpha = _head_scores_v2(qh, kh, St, G, ebh, mask, dh, mm).astype(dt)

    g_alpha = jax.lax.dot_general(
        gh.astype(mm), vh.astype(mm), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    gv_ref[0] = jax.lax.dot_general(
        alpha.astype(mm), gh.astype(mm), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    af = alpha.astype(jnp.float32)
    tmp = af * g_alpha
    g_s = (tmp - af * jnp.sum(tmp, axis=-1, keepdims=True)).astype(dt)

    gq_ref[0] = (
        jax.lax.dot_general(
            g_s.astype(mm), kh.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / math.sqrt(dh))
    ).astype(dt)
    gk_ref[0] = (
        jax.lax.dot_general(
            g_s.astype(mm), qh.astype(mm), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (1.0 / math.sqrt(dh))
    ).astype(dt)
    if edge_bias:
        T = jax.lax.dot_general(
            St, g_s.astype(mm), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [NB, E, V(j)]
        geb_ref[0] = jnp.sum(T * G.astype(jnp.float32), axis=-1).astype(
            geb_ref.dtype
        )
    else:
        geb_ref[0] = jnp.zeros_like(geb_ref[0])


def _v2_layout(q, num_heads):
    B, V, d = q.shape
    dh = d // num_heads
    return q.reshape(B, V, num_heads, dh).transpose(2, 0, 1, 3)  # [H, B, V, dh]


def _v2_unlayout(qT):
    H, B, V, dh = qT.shape
    return qT.transpose(1, 2, 0, 3).reshape(B, V, H * dh)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "bins_per_tile", "interpret", "matmul_dtype"),
)
def fused_dense_attention_fwd_v2(
    q, k, v, eb, src, dst, edge_mask,
    *, num_heads: int, bins_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    B, V, d, E, NB, _, _, _, edge_bias, eb = _common_call(
        q, eb, src, dst, edge_mask, num_heads, bins_per_tile
    )
    dh = d // num_heads
    emask = edge_mask.astype(jnp.float32)
    idx_specs, idx_ops, blocked = _idx_operands2(src, dst, emask, B, E, NB)
    kernel = functools.partial(
        _attn_kernel_v2, tile=NB, dh=dh, edge_bias=edge_bias,
        mm_dtype=matmul_dtype, blocked_idx=blocked,
    )
    head_blk = pl.BlockSpec((1, NB, V, dh), lambda i, h: (h, i, 0, 0))
    eb_blk = pl.BlockSpec((1, NB, E), lambda i, h: (h * (B // NB) + i, 0, 0))
    ebG = jnp.swapaxes(eb, 0, 1).reshape(num_heads * (B // NB), NB, E)
    qT, kT, vT = _v2_layout(q, num_heads), _v2_layout(k, num_heads), _v2_layout(v, num_heads)
    outT = pl.pallas_call(
        kernel,
        grid=(B // NB, num_heads),
        in_specs=idx_specs + [head_blk, head_blk, head_blk, eb_blk],
        out_specs=head_blk,
        out_shape=jax.ShapeDtypeStruct((num_heads, B, V, dh), q.dtype),
        interpret=interpret,
    )(*idx_ops, qT, kT, vT, ebG)
    return _v2_unlayout(outT)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "bins_per_tile", "interpret", "matmul_dtype"),
)
def fused_dense_attention_bwd_v2(
    q, k, v, eb, src, dst, edge_mask, cotangent,
    *, num_heads: int, bins_per_tile: int = 8,
    interpret: bool = False, matmul_dtype: str | None = None,
):
    """Head-in-grid recompute backward: returns (g_q, g_k, g_v, g_eb)."""
    B, V, d, E, NB, _, _, _, edge_bias, eb = _common_call(
        q, eb, src, dst, edge_mask, num_heads, bins_per_tile
    )
    dh = d // num_heads
    emask = edge_mask.astype(jnp.float32)
    idx_specs, idx_ops, blocked = _idx_operands2(src, dst, emask, B, E, NB)
    kernel = functools.partial(
        _attn_bwd_kernel_v2, tile=NB, dh=dh, edge_bias=edge_bias,
        mm_dtype=matmul_dtype, blocked_idx=blocked,
    )
    head_blk = pl.BlockSpec((1, NB, V, dh), lambda i, h: (h, i, 0, 0))
    eb_blk = pl.BlockSpec((1, NB, E), lambda i, h: (h * (B // NB) + i, 0, 0))
    ebG = jnp.swapaxes(eb, 0, 1).reshape(num_heads * (B // NB), NB, E)
    qT, kT, vT = _v2_layout(q, num_heads), _v2_layout(k, num_heads), _v2_layout(v, num_heads)
    gT = _v2_layout(cotangent, num_heads)
    gqT, gkT, gvT, gebG = pl.pallas_call(
        kernel,
        grid=(B // NB, num_heads),
        in_specs=idx_specs + [head_blk, head_blk, head_blk, eb_blk, head_blk],
        out_specs=[head_blk, head_blk, head_blk, eb_blk],
        out_shape=[
            jax.ShapeDtypeStruct((num_heads, B, V, dh), q.dtype),
            jax.ShapeDtypeStruct((num_heads, B, V, dh), q.dtype),
            jax.ShapeDtypeStruct((num_heads, B, V, dh), q.dtype),
            jax.ShapeDtypeStruct((num_heads * (B // NB), NB, E), q.dtype),
        ],
        interpret=interpret,
    )(*idx_ops, qT, kT, vT, ebG, gT)
    geb = jnp.swapaxes(
        gebG.reshape(num_heads, B, E), 0, 1
    )  # back to [B, H, E]
    return _v2_unlayout(gqT), _v2_unlayout(gkT), _v2_unlayout(gvT), geb

"""Pallas TPU kernel: the fused GVP message convolution.

The round-5 decomposition (BASELINE.md) measured the GVP conv as an
HBM-bound chain of ~30 gather/broadcast/concat/elementwise ops: gathers
~55% of train, the message-GVP matmuls ~5%, and no XLA-level lever
(windowed gathers, one-hot gathers, bf16, build hoisting) moved it. This
kernel runs the ENTIRE per-neighbor message stack for a tile of nodes with
everything resident in VMEM:

    gather (windowed one-hot matmul over a [T+2W]-row local table)
    -> 3 GatedGVP message layers -> masked mean aggregation

so the [N, K, .] message tensors never touch HBM. Requires the banded
neighbor structure (``radius_neighbors(window=W)``): every neighbor of a
tile's nodes lies within the tile's +-W halo, so the gather is a small
[T*K, T+2W] one-hot contraction built in-register.

Two Mosaic-shaped design choices (both lessons from this round's attention
kernels — BASELINE.md):

- vectors ride as THREE separate [rows, dv] component arrays (x/y/z): the
  [.., 3, dv] form's tiny minor dim explodes under (8, 128) VMEM tiling;
- every concat is replaced by SPLIT weights (``cat([a, b]) @ W ==
  a @ W_a + b @ W_b``), so neither the forward nor the backward ever
  slices a sub-128-lane minor dim.

The backward RECOMPUTES the tile's forward in VMEM and runs the reverse
sweep in the same kernel; weight gradients accumulate across the
(sequential) grid, and the gather VJP is the transposed one-hot
contraction into the tile's halo rows (overlapping halos accumulate
across steps).

Semantics match :class:`notorch_tpu.nn.spatial.gvp.GvpConv` with
``num_message_gvps=3, dropout=0`` (the production configuration);
reference spec: ``notorch/nn/gvp/conv.py:16-127``. Residual +
DualRankLayerNorm and the rbf/unit edge features stay in XLA; the kernel
emits rbf/unit cotangents so coords gradients flow exactly as in the jnp
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

EPS = 1e-8

# layer-0 weights (split): Wh_i, Wh_j, wh_u, Wmu, Wm_si, Wm_sj, Wm_rbf,
# Wm_nrm, bm, Wg, bg  (11)
# layers 1-2:              Wh, Wmu, Wm_s, Wm_nrm, bm, Wg, bg  (7)
N_W0 = 11
N_W12 = 7
N_W = N_W0 + 2 * N_W12  # 25


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotT(a, b):
    """a^T @ b for [R, m], [R, n] -> [m, n] (weight-grad shape)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotBT(a, b):
    """a @ b^T for [R, n], [m, n] -> [R, m]."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def split_gvp_weights(params, ds: int, dv: int, nb: int):
    """GvpConv ``message_i`` flax param tree -> the kernel's 25 arrays
    (concat-free split form). Pure jnp slicing; run OUTSIDE the kernel."""
    p0 = params["message_0"]
    h0 = 2 * dv + 1
    Wh0 = jnp.asarray(p0["W_h"]["kernel"])  # [2dv+1, h0]
    Wm0 = jnp.asarray(p0["W_m"]["kernel"])  # [2ds+nb+h0, ds]
    out = [
        Wh0[:dv], Wh0[dv : 2 * dv], Wh0[2 * dv :],
        jnp.asarray(p0["W_mu"]["kernel"]),
        Wm0[:ds], Wm0[ds : 2 * ds], Wm0[2 * ds : 2 * ds + nb],
        Wm0[2 * ds + nb :],
        jnp.asarray(p0["W_m"]["bias"]),
        jnp.asarray(p0["W_g"]["kernel"]),
        jnp.asarray(p0["W_g"]["bias"]),
    ]
    for li in (1, 2):
        p = params[f"message_{li}"]
        Wm = jnp.asarray(p["W_m"]["kernel"])  # [ds+dv, ds]
        out += [
            jnp.asarray(p["W_h"]["kernel"]),
            jnp.asarray(p["W_mu"]["kernel"]),
            Wm[:ds], Wm[ds:],
            jnp.asarray(p["W_m"]["bias"]),
            jnp.asarray(p["W_g"]["kernel"]),
            jnp.asarray(p["W_g"]["bias"]),
        ]
    return tuple(out)


def merge_gvp_weight_grads(grads, params, ds: int, dv: int, nb: int):
    """Inverse of :func:`split_gvp_weights` for gradients: 25 arrays ->
    the GvpConv param-tree structure."""
    g = list(grads)
    (Whi, Whj, whu, gWmu, gWsi, gWsj, gWrbf, gWnrm, gbm, gWg, gbg) = g[:N_W0]
    tree = {
        "message_0": {
            "W_h": {"kernel": jnp.concatenate([Whi, Whj, whu], axis=0)},
            "W_mu": {"kernel": gWmu},
            "W_m": {
                "kernel": jnp.concatenate([gWsi, gWsj, gWrbf, gWnrm], axis=0),
                "bias": gbm,
            },
            "W_g": {"kernel": gWg, "bias": gbg},
        }
    }
    for li in (1, 2):
        (Wh, Wmu, Ws, Wnrm, bm, Wg, bg) = g[
            N_W0 + (li - 1) * N_W12 : N_W0 + li * N_W12
        ]
        tree[f"message_{li}"] = {
            "W_h": {"kernel": Wh},
            "W_mu": {"kernel": Wmu},
            "W_m": {"kernel": jnp.concatenate([Ws, Wnrm], axis=0), "bias": bm},
            "W_g": {"kernel": Wg, "bias": bg},
        }
    return tree


def _layer_fwd(s_terms, v_in, w, act_gate):
    """One split-weight GatedGVP layer. ``s_terms`` = list of (x, W) pairs
    already matmul-ready for the scalar path (minus the norm term);
    ``v_in`` = 3 components already matmul'd through the Wh split —
    i.e. vh components. Returns (s_out, v_out, residuals)."""
    Wmu, Wm_nrm, bm, Wg, bg = w
    vh = v_in
    nrm = jnp.sqrt(vh[0] ** 2 + vh[1] ** 2 + vh[2] ** 2 + EPS)
    mid = bm[None, :] + _dot(nrm, Wm_nrm)
    for x, Wx in s_terms:
        mid = mid + _dot(x, Wx)
    s_out = jnp.maximum(mid, 0.0)
    gate_pre = bg[None, :] + _dot(mid, Wg)
    gate = jax.nn.sigmoid(gate_pre) if act_gate else gate_pre
    vmu = tuple(_dot(c, Wmu) for c in vh)
    v_out = tuple(c * gate for c in vmu)
    return s_out, v_out, (vh, nrm, mid, gate, vmu)


def _layer_bwd(g_s_out, g_v_out, s_terms, w, res, act_gate):
    """Reverse of :func:`_layer_fwd`. Returns (g_mid-independent pieces):
    (g_s_terms [same order], g_nrm-folded g_vh components, weight grads
    dict-ordered (gWmu, gWnrm, gbm, gWg, gbg, g_s_term_Ws...))."""
    Wmu, Wm_nrm, bm, Wg, bg = w
    vh, nrm, mid, gate, vmu = res
    g_vmu = tuple(gc * gate for gc in g_v_out)
    g_gate = g_v_out[0] * vmu[0] + g_v_out[1] * vmu[1] + g_v_out[2] * vmu[2]
    if act_gate:
        g_gate_pre = g_gate * gate * (1.0 - gate)
    else:
        g_gate_pre = g_gate
    g_mid = g_s_out * jnp.where(mid > 0, 1.0, 0.0) + _dotBT(g_gate_pre, Wg)
    gWg = _dotT(mid, g_gate_pre)
    gbg = jnp.sum(g_gate_pre, axis=0)
    gbm = jnp.sum(g_mid, axis=0)
    g_nrm = _dotBT(g_mid, Wm_nrm)
    gWnrm = _dotT(nrm, g_mid)
    g_vh = tuple(
        _dotBT(g_vmu[c], Wmu) + g_nrm * vh[c] / nrm for c in range(3)
    )
    gWmu = _dotT(vh[0], g_vmu[0]) + _dotT(vh[1], g_vmu[1]) + _dotT(vh[2], g_vmu[2])
    g_s_terms = [_dotBT(g_mid, Wx) for _, Wx in s_terms]
    gW_s_terms = [_dotT(x, g_mid) for x, _ in s_terms]
    return g_s_terms, g_vh, g_mid, (gWmu, gWnrm, gbm, gWg, gbg), gW_s_terms


def _tile_inputs(s_loc, v_loc, nbr, r0, T, K, W):
    """One-hot gather operator + broadcast/gathered message inputs."""
    L = T + 2 * W
    ds = s_loc.shape[-1]
    dv = v_loc[0].shape[-1]
    local = nbr - (r0 - W)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, K, L), 2)
    oh = jnp.where(local[:, :, None] == iota, 1.0, 0.0).reshape(T * K, L)
    s_tile = jax.lax.slice(s_loc, (W, 0), (W + T, ds))
    s_i = jnp.broadcast_to(s_tile[:, None, :], (T, K, ds)).reshape(T * K, ds)
    s_j = _dot(oh, s_loc)
    v_i, v_j = [], []
    for comp in v_loc:
        tile = jax.lax.slice(comp, (W, 0), (W + T, dv))
        v_i.append(jnp.broadcast_to(tile[:, None, :], (T, K, dv)).reshape(T * K, dv))
        v_j.append(_dot(oh, comp))
    return oh, s_i, s_j, v_i, v_j


def _stack_fwd(s_i, s_j, v_i, v_j, rbf, u, w):
    """The 3-layer message stack on split weights. Returns per-layer
    outputs + residuals for the reverse sweep."""
    (Whi, Whj, whu, Wmu0, Wsi, Wsj, Wrbf, Wnrm0, bm0, Wg0, bg0) = w[:N_W0]
    w1 = w[N_W0 : N_W0 + N_W12]
    w2 = w[N_W0 + N_W12 :]

    vh0 = tuple(
        _dot(v_i[c], Whi) + _dot(v_j[c], Whj) + _dot(u[c], whu) for c in range(3)
    )
    s0_terms = [(s_i, Wsi), (s_j, Wsj), (rbf, Wrbf)]
    s0, v0, r0_ = _layer_fwd(s0_terms, vh0, (Wmu0, Wnrm0, bm0, Wg0, bg0), True)

    vh1 = tuple(_dot(v0[c], w1[0]) for c in range(3))
    s1, v1, r1_ = _layer_fwd([(s0, w1[2])], vh1, (w1[1], w1[3], w1[4], w1[5], w1[6]), True)

    vh2 = tuple(_dot(v1[c], w2[0]) for c in range(3))
    s2, v2, r2_ = _layer_fwd([(s1, w2[2])], vh2, (w2[1], w2[3], w2[4], w2[5], w2[6]), False)
    return (s0, v0, r0_), (s1, v1, r1_), (s2, v2, r2_)


def _split_v(vloc, dv):
    """Packed [rows, 3*dv] -> 3 components (the packing keeps the whole
    array at ONE 128-lane pad instead of three — VMEM budget, see bwd)."""
    L = vloc.shape[0]
    return tuple(
        jax.lax.slice(vloc, (0, c * dv), (L, (c + 1) * dv)) for c in range(3)
    )


def _fwd_kernel(
    s_ref, v_ref, nbr_ref, msk_ref,
    rbf_ref, ux_ref, uy_ref, uz_ref,
    *rest,
    T: int, K: int, W: int, dv: int,
):
    wrefs = rest[:N_W]
    outs_ref, outv_ref = rest[N_W:]
    i = pl.program_id(0)
    r0 = i * T
    L = T + 2 * W
    ds = s_ref.shape[-1]
    nbr = nbr_ref[pl.ds(r0, T), :]
    msk = msk_ref[pl.ds(r0, T), :]
    w = tuple(r[:] for r in wrefs)
    s_loc = s_ref[pl.ds(r0, L), :]
    v_loc = _split_v(v_ref[pl.ds(r0, L), :], dv)
    oh, s_i, s_j, v_i, v_j = _tile_inputs(s_loc, v_loc, nbr, r0, T, K, W)
    u = (ux_ref[:], uy_ref[:], uz_ref[:])
    _, _, (s2, v2, _) = _stack_fwd(s_i, s_j, v_i, v_j, rbf_ref[:], u, w)

    m3 = msk[:, :, None]
    denom = jnp.maximum(jnp.sum(msk, axis=1, keepdims=True), 1.0)
    outs_ref[:] = jnp.sum(s2.reshape(T, K, ds) * m3, axis=1) / denom
    outv_ref[:] = jnp.concatenate(
        [jnp.sum(c.reshape(T, K, dv) * m3, axis=1) / denom for c in v2], axis=-1
    )


def _bwd_kernel(
    s_ref, v_ref, nbr_ref, msk_ref,
    rbf_ref, ux_ref, uy_ref, uz_ref,
    *rest,
    T: int, K: int, W: int, n_tiles: int, dv: int,
):
    wrefs = rest[:N_W]
    gs_out_ref, gv_out_ref = rest[N_W : N_W + 2]
    (gs_ref, gv_ref, grbf_ref, gux_ref, guy_ref, guz_ref) = rest[
        N_W + 2 : N_W + 8
    ]
    gw_refs = rest[N_W + 8 :]
    i = pl.program_id(0)
    r0 = i * T
    L = T + 2 * W
    ds = s_ref.shape[-1]
    nbr = nbr_ref[pl.ds(r0, T), :]
    msk = msk_ref[pl.ds(r0, T), :]
    w = tuple(r[:] for r in wrefs)

    @pl.when(i == 0)
    def _init():
        gs_ref[:] = jnp.zeros_like(gs_ref)
        gv_ref[:] = jnp.zeros_like(gv_ref)
        for r in gw_refs:
            r[:] = jnp.zeros_like(r)

    # ---- recompute the tile forward --------------------------------------
    s_loc = s_ref[pl.ds(r0, L), :]
    v_loc = _split_v(v_ref[pl.ds(r0, L), :], dv)
    oh, s_i, s_j, v_i, v_j = _tile_inputs(s_loc, v_loc, nbr, r0, T, K, W)
    rbf = rbf_ref[:]
    u = (ux_ref[:], uy_ref[:], uz_ref[:])
    (s0, v0, res0), (s1, v1, res1), (s2, v2, res2) = _stack_fwd(
        s_i, s_j, v_i, v_j, rbf, u, w
    )

    # ---- aggregation reverse ---------------------------------------------
    m3 = msk[:, :, None]
    denom = jnp.maximum(jnp.sum(msk, axis=1, keepdims=True), 1.0)
    # multiply in [T, K, .] space, THEN merge leading dims — a [T*K, 1]
    # reshape of the mask is an unsupported Mosaic shape cast
    gsc = (gs_out_ref[:] / denom)[:, None, :]
    g_s2 = (jnp.broadcast_to(gsc, (T, K, ds)) * m3).reshape(T * K, ds)
    g_v2 = []
    for gc in _split_v(gv_out_ref[:], dv):
        gvc = (gc / denom)[:, None, :]
        g_v2.append((jnp.broadcast_to(gvc, (T, K, dv)) * m3).reshape(T * K, dv))
    g_v2 = tuple(g_v2)

    (Whi, Whj, whu, Wmu0, Wsi, Wsj, Wrbf, Wnrm0, bm0, Wg0, bg0) = w[:N_W0]
    w1 = w[N_W0 : N_W0 + N_W12]
    w2 = w[N_W0 + N_W12 :]

    # ---- layer 2 (raw gate) ----------------------------------------------
    g_sterms2, g_vh2, _, core2, gWs2 = _layer_bwd(
        g_s2, g_v2, [(s1, w2[2])], (w2[1], w2[3], w2[4], w2[5], w2[6]), res2, False
    )
    g_s1 = g_sterms2[0]
    g_v1 = tuple(_dotBT(g_vh2[c], w2[0]) for c in range(3))
    gWh2 = (
        _dotT(v1[0], g_vh2[0]) + _dotT(v1[1], g_vh2[1]) + _dotT(v1[2], g_vh2[2])
    )

    # ---- layer 1 ----------------------------------------------------------
    g_sterms1, g_vh1, _, core1, gWs1 = _layer_bwd(
        g_s1, g_v1, [(s0, w1[2])], (w1[1], w1[3], w1[4], w1[5], w1[6]), res1, True
    )
    g_s0 = g_sterms1[0]
    g_v0 = tuple(_dotBT(g_vh1[c], w1[0]) for c in range(3))
    gWh1 = (
        _dotT(v0[0], g_vh1[0]) + _dotT(v0[1], g_vh1[1]) + _dotT(v0[2], g_vh1[2])
    )

    # ---- layer 0 ----------------------------------------------------------
    s0_terms = [(s_i, Wsi), (s_j, Wsj), (rbf, Wrbf)]
    g_sterms0, g_vh0, _, core0, gWs0 = _layer_bwd(
        g_s0, g_v0, s0_terms, (Wmu0, Wnrm0, bm0, Wg0, bg0), res0, True
    )
    g_s_i, g_s_j, g_rbf = g_sterms0
    g_v_i = tuple(_dotBT(g_vh0[c], Whi) for c in range(3))
    g_v_j = tuple(_dotBT(g_vh0[c], Whj) for c in range(3))
    g_u = tuple(_dotBT(g_vh0[c], whu) for c in range(3))
    gWhi = sum(_dotT(v_i[c], g_vh0[c]) for c in range(3))
    gWhj = sum(_dotT(v_j[c], g_vh0[c]) for c in range(3))
    gwhu = sum(_dotT(u[c], g_vh0[c]) for c in range(3))

    # ---- emit data grads ---------------------------------------------------
    grbf_ref[:] = g_rbf
    gux_ref[:] = g_u[0]
    guy_ref[:] = g_u[1]
    guz_ref[:] = g_u[2]
    # gather VJP: halo rows accumulate across the sequential grid. The
    # self-row (s_i) contribution pads into the halo frame with explicit
    # zero concats (jnp.pad is not Mosaic-lowerable here)
    zs = jnp.zeros((W, ds), g_s_j.dtype)
    gs_ref[pl.ds(r0, L), :] += _dotT(oh, g_s_j) + jnp.concatenate(
        [zs, jnp.sum(g_s_i.reshape(T, K, ds), axis=1), zs], axis=0
    )
    zv = jnp.zeros((W, dv), g_s_j.dtype)
    gv_ref[pl.ds(r0, L), :] += jnp.concatenate(
        [
            _dotT(oh, gvj) + jnp.concatenate(
                [zv, jnp.sum(gvi.reshape(T, K, dv), axis=1), zv], axis=0
            )
            for gvj, gvi in zip(g_v_j, g_v_i)
        ],
        axis=-1,
    )

    # ---- weight grads (accumulated) ---------------------------------------
    gw_vals = [
        gWhi, gWhj, gwhu, core0[0], gWs0[0], gWs0[1], gWs0[2], core0[1],
        core0[2], core0[3], core0[4],
        gWh1, core1[0], gWs1[0], core1[1], core1[2], core1[3], core1[4],
        gWh2, core2[0], gWs2[0], core2[1], core2[2], core2[3], core2[4],
    ]
    for ref, val in zip(gw_refs, gw_vals):
        ref[:] += val.astype(ref.dtype)


def _specs(sp, vp, nbrs, mskf, rbf2d, wlist, T, K):
    whole = lambda arr: pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape))
    tk_blk = lambda w_: pl.BlockSpec((T * K, w_), lambda i: (i, 0))
    in_specs = (
        [whole(sp), whole(vp), whole(nbrs), whole(mskf),
         tk_blk(rbf2d.shape[-1]), tk_blk(1), tk_blk(1), tk_blk(1)]
        + [whole(w_) for w_ in wlist]
    )
    return in_specs, whole, tk_blk


def _prep(s, vx, nbrs, mask, window, tile):
    N = s.shape[0]
    K = nbrs.shape[-1]
    W = int(window)
    if W % 8 != 0:
        raise ValueError(f"window must be a multiple of 8 (got {W})")
    T = int(tile)
    while N % T != 0:
        T //= 2
    if T < 8:
        raise ValueError(f"node count {N} not tileable (tile fell to {T})")
    return N, K, W, T


def _padrow(x, W):
    z = jnp.zeros((W,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, x, z], axis=0)


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def fused_gvp_conv_fwd(
    s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
    *, window: int, tile: int = 64, interpret: bool = False,
):
    """Forward: s [N, ds], v components [N, dv], nbrs/mask [N, K],
    rbf2d [N*K, nb], u* [N*K, 1], wlist = the 25 split weights
    (:func:`split_gvp_weights`). Returns (agg_s, agg_vx, agg_vy, agg_vz)."""
    N, K, W, T = _prep(s, vx, nbrs, mask, window, tile)
    ds = s.shape[-1]
    dv = vx.shape[-1]
    sp = _padrow(s, W)
    vp = _padrow(jnp.concatenate([vx, vy, vz], axis=-1), W)
    mskf = mask.astype(jnp.float32)
    in_specs, whole, tk_blk = _specs(sp, vp, nbrs, mskf, rbf2d, wlist, T, K)
    t_blk = lambda w_: pl.BlockSpec((T, w_), lambda i: (i, 0))
    kernel = functools.partial(_fwd_kernel, T=T, K=K, W=W, dv=dv)
    out_s, out_v = pl.pallas_call(
        kernel,
        grid=(N // T,),
        in_specs=in_specs,
        out_specs=[t_blk(ds), t_blk(3 * dv)],
        out_shape=[
            jax.ShapeDtypeStruct((N, ds), s.dtype),
            jax.ShapeDtypeStruct((N, 3 * dv), s.dtype),
        ],
        interpret=interpret,
    )(sp, vp, nbrs, mskf, rbf2d, ux, uy, uz, *wlist)
    return out_s, out_v[:, :dv], out_v[:, dv : 2 * dv], out_v[:, 2 * dv :]


@functools.partial(jax.jit, static_argnames=("window", "tile", "interpret"))
def fused_gvp_conv_bwd(
    s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
    g_s, g_vx, g_vy, g_vz,
    *, window: int, tile: int = 64, interpret: bool = False,
):
    """Recompute backward. Returns (g_s, g_vx, g_vy, g_vz, g_rbf2d,
    g_ux, g_uy, g_uz, g_wlist)."""
    N, K, W, T = _prep(s, vx, nbrs, mask, window, tile)
    ds = s.shape[-1]
    dv = vx.shape[-1]
    nb = rbf2d.shape[-1]
    sp = _padrow(s, W)
    vp = _padrow(jnp.concatenate([vx, vy, vz], axis=-1), W)
    mskf = mask.astype(jnp.float32)
    in_specs, whole, tk_blk = _specs(sp, vp, nbrs, mskf, rbf2d, wlist, T, K)
    t_blk = lambda w_: pl.BlockSpec((T, w_), lambda i: (i, 0))
    in_specs += [t_blk(ds), t_blk(3 * dv)]
    out_specs = (
        [whole(sp), whole(vp), tk_blk(nb), tk_blk(1), tk_blk(1), tk_blk(1)]
        + [whole(w_) for w_ in wlist]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(sp.shape, s.dtype),
         jax.ShapeDtypeStruct(vp.shape, s.dtype),
         jax.ShapeDtypeStruct(rbf2d.shape, s.dtype)]
        + [jax.ShapeDtypeStruct(ux.shape, s.dtype)] * 3
        + [jax.ShapeDtypeStruct(w_.shape, w_.dtype) for w_ in wlist]
    )
    kernel = functools.partial(_bwd_kernel, T=T, K=K, W=W, n_tiles=N // T, dv=dv)
    gvpack = jnp.concatenate([g_vx, g_vy, g_vz], axis=-1)
    res = pl.pallas_call(
        kernel,
        grid=(N // T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(sp, vp, nbrs, mskf, rbf2d, ux, uy, uz, *wlist, g_s, gvpack)
    gs_pad, gv_pad, g_rbf, g_ux, g_uy, g_uz = res[:6]
    g_w = res[6:]
    unpad = lambda x: x[W : W + N]
    gv = unpad(gv_pad)
    return (unpad(gs_pad), gv[:, :dv], gv[:, dv : 2 * dv], gv[:, 2 * dv :],
            g_rbf, g_ux, g_uy, g_uz, tuple(g_w))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def fused_gvp_conv(
    s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
    window: int, tile: int = 64, interpret: bool = False,
):
    """Trainable fused GVP message conv (forward + recompute backward in
    Pallas). ``wlist`` is the 25-tuple from :func:`split_gvp_weights`."""
    return fused_gvp_conv_fwd(
        s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
        window=window, tile=tile, interpret=interpret,
    )


def _fgc_fwd(s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
             window, tile, interpret):
    out = fused_gvp_conv_fwd(
        s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
        window=window, tile=tile, interpret=interpret,
    )
    return out, (s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist)


def _fgc_bwd(window, tile, interpret, resids, g):
    s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist = resids
    g_s, g_vx, g_vy, g_vz = g
    # the reverse sweep holds ~2x the forward's live tensors (residuals +
    # cotangents): tile 64 blew Mosaic's 16M scoped-VMEM budget by 12M on
    # v5e, tile 16 fits
    (gs, gvx, gvy, gvz, g_rbf, g_ux, g_uy, g_uz, g_w) = fused_gvp_conv_bwd(
        s, vx, vy, vz, nbrs, mask, rbf2d, ux, uy, uz, wlist,
        g_s, g_vx, g_vy, g_vz,
        window=window, tile=max(tile // 4, 8), interpret=interpret,
    )
    return (gs, gvx, gvy, gvz, None, None, g_rbf, g_ux, g_uy, g_uz, g_w)


fused_gvp_conv.defvjp(_fgc_fwd, _fgc_bwd)

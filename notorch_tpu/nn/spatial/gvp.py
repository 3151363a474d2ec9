"""Geometric Vector Perceptrons (GVP) and the GVP graph stack.

Capability parity: reference ``notorch/nn/spatial/gvp/layers.py`` and
``gvp/conv.py`` (arXiv:2106.03843), with its ctor/cat-dim/branch bugs fixed:

- :class:`GVP` / :class:`GatedGVP`: rotation-equivariant (scalar, vector)
  feature transforms;
- rotation-safe ChannelDropout / Dropout / LayerNorm for dual-rank tuples;
- :class:`GvpConv`: static-K radius neighborhoods -> RBF + unit-vector edge
  features -> stacked-GVP messages -> masked neighborhood mean -> residual +
  LayerNorm;
- :class:`GvpGNNLayer` / :class:`GvpGNNBlock`: conv + update stacks.

Dual-rank features are a ``(scalars [N, ds], vectors [N, 3, dv])`` tuple (the
reference's ``DualRankFeatures``, data/models/gvp.py:16).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from notorch_tpu.data.point_cloud import BatchedPointCloud
from notorch_tpu.nn.rbf import RBFEmbedding
from notorch_tpu.nn.spatial.neighbors import radius_neighbors

EPS = 1e-8


def _norm(v: jnp.ndarray, axis: int = -2, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt((v**2).sum(axis=axis, keepdims=keepdims) + EPS)


class GVP(nn.Module):
    """Plain geometric vector perceptron (reference gvp/layers.py:11-49).

    scalars' update sees the vector norms; vectors are mixed channel-wise
    (rotation-equivariant) and gated by their new norms' nonlinearity.
    """

    out_scalar: int
    out_vector: int
    hidden_vector: int | None = None
    scalar_act: Callable = nn.relu
    vector_act: Callable | None = jax.nn.sigmoid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sv: tuple[jnp.ndarray, jnp.ndarray], training: bool = False):
        s, v = sv  # [*, ds], [*, 3, dv]
        h = self.hidden_vector or max(v.shape[-1], self.out_vector)

        v_h = nn.Dense(h, use_bias=False, dtype=self.dtype, name="W_h")(v)  # [*, 3, h]
        v_mu = nn.Dense(self.out_vector, use_bias=False, dtype=self.dtype, name="W_mu")(v_h)

        s_in = jnp.concatenate([s, _norm(v_h)], axis=-1)
        s_out = nn.Dense(self.out_scalar, dtype=self.dtype, name="W_m")(s_in)
        s_out = self.scalar_act(s_out)

        if self.vector_act is not None:
            gate = self.vector_act(_norm(v_mu, keepdims=True))
            v_out = v_mu * gate
        else:
            v_out = v_mu
        return s_out, v_out


class GatedGVP(nn.Module):
    """Gated GVP variant (reference gvp/layers.py:52-114): vector gate from
    the scalar path."""

    out_scalar: int
    out_vector: int
    hidden_vector: int | None = None
    scalar_act: Callable = nn.relu
    vector_act: Callable | None = jax.nn.sigmoid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sv: tuple[jnp.ndarray, jnp.ndarray], training: bool = False):
        s, v = sv
        h = self.hidden_vector or max(v.shape[-1], self.out_vector)

        v_h = nn.Dense(h, use_bias=False, dtype=self.dtype, name="W_h")(v)
        v_mu = nn.Dense(self.out_vector, use_bias=False, dtype=self.dtype, name="W_mu")(v_h)

        s_in = jnp.concatenate([s, _norm(v_h)], axis=-1)
        s_mid = nn.Dense(self.out_scalar, dtype=self.dtype, name="W_m")(s_in)
        s_out = self.scalar_act(s_mid)

        gate = nn.Dense(self.out_vector, dtype=self.dtype, name="W_g")(s_mid)
        if self.vector_act is not None:
            gate = self.vector_act(gate)
        v_out = v_mu * gate[..., None, :]
        return s_out, v_out


class DualRankLayerNorm(nn.Module):
    """LayerNorm for (scalar, vector) tuples: standard LN on scalars, RMS
    normalization of vector norms (rotation-safe; reference layers.py:150)."""

    @nn.compact
    def __call__(self, sv, training: bool = False):
        s, v = sv
        s = nn.LayerNorm(name="scalar_ln")(s)
        norms2 = (v**2).sum(axis=-2, keepdims=True)  # [*, 1, dv]
        rms = jnp.sqrt(norms2.mean(axis=-1, keepdims=True) + EPS)
        return s, v / rms


class DualRankDropout(nn.Module):
    """Rotation-safe dropout: scalars element-wise, vectors channel-wise
    (a dropped vector channel zeroes all 3 components; reference
    layers.py:117-147)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, sv, training: bool = False):
        s, v = sv
        s = nn.Dropout(self.rate, deterministic=not training)(s)
        if self.rate > 0.0 and training:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.rate, v.shape[:-2] + (1, v.shape[-1]))
            v = jnp.where(keep, v / (1.0 - self.rate), 0.0)
        return s, v


class DualRankAggregation(nn.Module):
    """Per-graph pooling of dual-rank features over ``batch_index``
    (reference gvp/layers.py:166-181): segment mean of scalars and vectors."""

    reduce: str = "mean"

    @nn.compact
    def __call__(
        self,
        sv: tuple[jnp.ndarray, jnp.ndarray],
        P: BatchedPointCloud,
        training: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        from notorch_tpu.nn.ops import segment_mean, segment_sum

        fn = segment_mean if self.reduce == "mean" else segment_sum
        s, v = sv
        n = P.n_graphs + 1
        return fn(s, P.batch_index, n)[: P.n_graphs], fn(v, P.batch_index, n)[: P.n_graphs]


# XLA's scatter-add transpose of an [N, K] gather measured ~65% of the GVP
# train step on v5e (scripts/exp_gvp_train_r4.py: stop-gradient on the
# gathers lifts train 15.5M -> 44M interactions/s). The MXU backward below
# (chunked one-hot contraction, exact in f32 accumulation) measured 30.6M
# — 2.0x the scatter. Above this element bound the chunked one-hots stop
# fitting comfortably; fall back to the scatter transpose.
_ONEHOT_BWD_MAX_NK = 128 * 1024
_ONEHOT_CHUNK = 512


@jax.custom_vjp
def _nbr_take(x, nbrs):
    """Neighbor gather ``x[nbrs]`` ([N, ...] x [N, K] -> [N, K, ...]) with
    an MXU-shaped backward: the VJP contracts the cotangent against
    N-column chunks of the index one-hot instead of issuing an N*K-index
    scatter-add (2.0x measured on the GVP train step; exact — the one-hot
    matmul accumulates in f32)."""
    return x[nbrs]


def _nbr_take_fwd(x, nbrs):
    return x[nbrs], (nbrs, x.shape[0])


def _nbr_take_bwd(res, g):
    nbrs, N = res
    NK = nbrs.size
    flat = g.reshape((NK,) + g.shape[2:])
    if NK > _ONEHOT_BWD_MAX_NK:
        gx = jax.ops.segment_sum(flat, nbrs.reshape(-1), num_segments=N)
        return gx, None
    flat2 = flat.reshape(NK, -1)
    ids = nbrs.reshape(-1)
    parts = []
    for n0 in range(0, N, _ONEHOT_CHUNK):
        onehot = (ids[:, None] == (n0 + jnp.arange(_ONEHOT_CHUNK))[None, :]).astype(
            flat2.dtype
        )
        parts.append(
            jax.lax.dot_general(
                onehot, flat2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(flat2.dtype)
        )
    gx = jnp.concatenate(parts, axis=0)[:N]
    return gx.reshape((N,) + flat.shape[1:]), None


_nbr_take.defvjp(_nbr_take_fwd, _nbr_take_bwd)


class _DenseParams(nn.Module):
    """Parameter shell matching an ``nn.Dense`` layer's tree (kernel/bias,
    same initializers) without running the matmul — lets the fused kernel
    path own identical, checkpoint-compatible parameters."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(), (self.features_out,))
            if self.use_bias
            else None
        )
        return k, b


class _GatedGvpParams(nn.Module):
    """Param tree of one :class:`GatedGVP` (W_h/W_mu/W_m/W_g), shell-only."""

    in_s: int
    in_v: int
    hidden_v: int
    out_s: int
    out_v: int

    @nn.compact
    def __call__(self):
        wh, _ = _DenseParams(self.in_v, self.hidden_v, use_bias=False, name="W_h")()
        wmu, _ = _DenseParams(self.hidden_v, self.out_v, use_bias=False, name="W_mu")()
        wm, bm = _DenseParams(self.in_s + self.hidden_v, self.out_s, name="W_m")()
        wg, bg = _DenseParams(self.out_s, self.out_v, name="W_g")()
        return {
            "W_h": {"kernel": wh},
            "W_mu": {"kernel": wmu},
            "W_m": {"kernel": wm, "bias": bm},
            "W_g": {"kernel": wg, "bias": bg},
        }


class GvpConv(nn.Module):
    """GVP message passing over static-K radius neighborhoods
    (reference gvp/conv.py:16-127).

    ``impl="fused"`` routes the whole per-neighbor message stack (windowed
    gather + 3 GatedGVP layers + masked mean aggregation) through the
    Pallas kernel (:mod:`notorch_tpu.kernels.gvp_conv`) — the [N, K, .]
    message tensors never touch HBM. Requires the banded neighbor
    structure (and dropout 0, 3 message GVPs, f32, node count % 64).
    MEASURED-CLOSED on v5e (BASELINE.md round 5): the kernel forward beats
    the XLA conv by ~27%/layer (349us vs ~480us) but its backward, capped
    at tile 16 by Mosaic's 16M scoped-VMEM budget, runs 983us/layer —
    Mosaic's ~1us/op/step fixed overhead dominates small-tile kernels
    (the same ceiling as the attention kernels). ``impl="auto"`` therefore
    resolves to the jnp path; "fused" stays available and parity-tested
    (outputs 2e-3 on chip = bf16-multiply order; grads 2.4e-5 global)."""

    scalar_dim: int
    vector_dim: int
    radius: float = 5.0
    max_neighbors: int = 16
    num_bases: int = 16
    num_message_gvps: int = 3
    dropout: float = 0.0
    dtype: Any = jnp.float32
    neighbor_window: int | None = None
    impl: str = "auto"  # "auto" | "fused" | "jnp"

    def _use_fused(self, N: int) -> bool:
        if self.impl != "fused":
            return False  # auto -> jnp (measured faster end to end; above)
        ok = (
            self.neighbor_window is not None
            and self.dropout == 0.0
            and self.num_message_gvps == 3
            and self.dtype == jnp.float32
            and N % 64 == 0
        )
        if self.impl == "fused" and not ok:
            raise ValueError(
                "impl='fused' needs neighbor_window set, dropout=0, "
                "num_message_gvps=3, f32, and a node count divisible by 64"
            )
        return ok

    @nn.compact
    def __call__(
        self,
        sv: tuple[jnp.ndarray, jnp.ndarray],
        P: BatchedPointCloud,
        training: bool = False,
        neighbors: tuple | None = None,
    ):
        s, v = sv  # [N, ds], [N, 3, dv]
        # ``neighbors``: precomputed (nbrs, mask, dists) — the round-5
        # decomposition measured the O(N^2) top_k build at ~90% of GVP
        # forward time, and coords are layer-invariant, so GvpGNNBlock
        # hoists ONE build over the whole depth stack
        N = s.shape[0]
        fused = self._use_fused(N)
        # the fused kernel's windowed gather needs a multiple-of-8 halo
        window = self.neighbor_window
        if fused and window is not None and window % 8 != 0:
            window = -(-window // 8) * 8
        if neighbors is not None:
            nbrs, mask, dists = neighbors
        else:
            nbrs, mask, dists = radius_neighbors(
                P.coords, P.batch_index, self.radius, self.max_neighbors,
                window=window,
            )
        # edge features: RBF distances (scalar) + unit displacement (vector)
        rbf = RBFEmbedding(0.0, self.radius, self.num_bases)(dists)  # [N, K, nb]
        disp = P.coords[nbrs] - P.coords[:, None, :]  # [N, K, 3]
        unit = disp / _norm(disp, axis=-1, keepdims=True)  # [N, K, 3]

        if fused:
            from notorch_tpu.kernels.gvp_conv import (
                fused_gvp_conv,
                split_gvp_weights,
            )

            ds, dv, nb = self.scalar_dim, self.vector_dim, self.num_bases
            in_v0 = 2 * dv + 1
            ptree = {
                "message_0": _GatedGvpParams(
                    2 * ds + nb, in_v0, max(in_v0, dv), ds, dv, name="message_0"
                )(),
                "message_1": _GatedGvpParams(ds, dv, dv, ds, dv, name="message_1")(),
                "message_2": _GatedGvpParams(ds, dv, dv, ds, dv, name="message_2")(),
            }
            wlist = split_gvp_weights(ptree, ds, dv, nb)
            K = nbrs.shape[-1]
            rbf2d = rbf.reshape(N * K, nb)
            ux = unit[..., 0].reshape(N * K, 1)
            uy = unit[..., 1].reshape(N * K, 1)
            uz = unit[..., 2].reshape(N * K, 1)
            interpret = jax.default_backend() != "tpu"
            agg_s, avx, avy, avz = fused_gvp_conv(
                s, v[:, 0, :], v[:, 1, :], v[:, 2, :], nbrs, mask,
                rbf2d, ux, uy, uz, wlist, int(window), 64, interpret,
            )
            agg_v = jnp.stack([avx, avy, avz], axis=1)
            return DualRankLayerNorm(name="ln")((s + agg_s, v + agg_v))

        # message inputs: dest scalars + src scalars + rbf | dest/src vectors + unit
        s_j = _nbr_take(s, nbrs)  # [N, K, ds]
        v_j = _nbr_take(v, nbrs)  # [N, K, 3, dv]
        s_in = jnp.concatenate(
            [jnp.broadcast_to(s[:, None], s_j.shape), s_j, rbf], axis=-1
        )
        v_in = jnp.concatenate(
            [jnp.broadcast_to(v[:, None], v_j.shape), v_j, unit[..., None]], axis=-1
        )

        msg = (s_in, v_in)
        for i in range(self.num_message_gvps):
            last = i == self.num_message_gvps - 1
            msg = GatedGVP(
                self.scalar_dim,
                self.vector_dim,
                vector_act=None if last else jax.nn.sigmoid,
                dtype=self.dtype,
                name=f"message_{i}",
            )(msg, training=training)

        msg = DualRankDropout(self.dropout, name="dropout")(msg, training=training)
        ms, mv = msg
        fmask = mask[..., None].astype(ms.dtype)
        denom = jnp.maximum(mask.sum(axis=1), 1)[:, None].astype(ms.dtype)
        agg_s = (ms * fmask).sum(axis=1) / denom
        agg_v = (mv * fmask[..., None, :] * 1.0).sum(axis=1) / denom[..., None]

        # residual + LayerNorm (conv.py:123-127)
        out = DualRankLayerNorm(name="ln")((s + agg_s, v + agg_v))
        return out


class GvpGNNLayer(nn.Module):
    """conv + pointwise update GVPs (reference gvp/conv.py:130-176)."""

    scalar_dim: int
    vector_dim: int
    radius: float = 5.0
    max_neighbors: int = 16
    num_update_gvps: int = 2
    dropout: float = 0.0
    dtype: Any = jnp.float32
    neighbor_window: int | None = None
    impl: str = "auto"  # conv message-stack impl (gvp_conv Pallas kernel)

    @nn.compact
    def __call__(self, sv, P: BatchedPointCloud, training: bool = False,
                 neighbors: tuple | None = None):
        sv = GvpConv(
            self.scalar_dim,
            self.vector_dim,
            self.radius,
            self.max_neighbors,
            dropout=self.dropout,
            dtype=self.dtype,
            neighbor_window=self.neighbor_window,
            impl=self.impl,
            name="conv",
        )(sv, P, training=training, neighbors=neighbors)
        s, v = sv
        upd = (s, v)
        for i in range(self.num_update_gvps):
            upd = GatedGVP(
                self.scalar_dim, self.vector_dim, dtype=self.dtype, name=f"update_{i}"
            )(upd, training=training)
        us, uv = DualRankDropout(self.dropout, name="dropout")(upd, training=training)
        return DualRankLayerNorm(name="ln")((s + us, v + uv))


class GvpGNNBlock(nn.Module):
    """N-layer GVP GNN over a point cloud (reference gvp/conv.py:180-221).
    Input: embedded scalar features; vectors start at zero."""

    scalar_dim: int = 128
    vector_dim: int = 16
    depth: int = 3
    radius: float = 5.0
    max_neighbors: int = 16
    dropout: float = 0.0
    dtype: Any = jnp.float32
    neighbor_window: int | None = None
    impl: str = "auto"

    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False) -> BatchedPointCloud:
        s = nn.Dense(self.scalar_dim, dtype=self.dtype, name="in_proj")(P.node_feats)
        v = jnp.zeros(s.shape[:-1] + (3, self.vector_dim), s.dtype)
        sv = (s, v)
        # ONE neighbor build for the whole stack (coords are layer-invariant;
        # the build — an O(N^2) or banded top_k — measured ~90% of forward
        # time when rebuilt per layer, BASELINE.md round 5)
        neighbors = radius_neighbors(
            P.coords, P.batch_index, self.radius, self.max_neighbors,
            window=self.neighbor_window,
        )
        for i in range(self.depth):
            sv = GvpGNNLayer(
                self.scalar_dim,
                self.vector_dim,
                self.radius,
                self.max_neighbors,
                dropout=self.dropout,
                dtype=self.dtype,
                neighbor_window=self.neighbor_window,
                impl=self.impl,
                name=f"layer_{i}",
            )(sv, P, training=training, neighbors=neighbors)
        return P.update(node_feats=sv[0])

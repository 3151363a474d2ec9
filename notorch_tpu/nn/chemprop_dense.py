"""D-MPNN over the dense per-molecule layout — the MXU hot path.

Same recurrence as :mod:`notorch_tpu.nn.chemprop` (reference
``notorch/nn/gnn/chemprop.py:28-88``), with every sparse op replaced by a
batched dense contraction (see ``notorch_tpu.data.dense``):

    scatter  -> einsum('bve,bed->bvd', S, m)        (MXU)
    gather   -> einsum('bev,bvd->bed', G, n)        (MXU)
    rev      -> pair-swap reshape                    (free)

The one-hot operators are built once per call in the layer's compute dtype;
XLA hoists them out of the depth loop.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.dense import DenseBatchedGraph, rev_pair_swap


class _Update(nn.Module):
    hidden_dim: int
    bias: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.hidden_dim, use_bias=self.bias, dtype=self.dtype, name="update")(x)


class _DenseParams(nn.Module):
    """Creates ``{kernel, bias}`` params with ``nn.Dense``'s exact tree and
    initializers, returning the values (for kernels that consume stacked
    weights directly)."""

    hidden_dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.hidden_dim, self.hidden_dim)
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.hidden_dim,))
        else:
            b = jnp.zeros((self.hidden_dim,), jnp.float32)
        return k, b


class _UpdateParams(nn.Module):
    """``layer_i/update/{kernel,bias}`` — the shared per-layer param tree of
    the flat/dense/fused D-MPNN blocks."""

    hidden_dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        return _DenseParams(self.hidden_dim, self.use_bias, name="update")()


class DenseChempropBlock(nn.Module):
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    act: Callable = nn.relu
    bias: bool = True
    dropout: float = 0.0
    depth: int = 3
    residual: bool = True
    shared: bool = False
    reduce: str = "sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> DenseBatchedGraph:
        if self.reduce not in ("sum", "mean", "max"):
            raise NotImplementedError(f"unknown reduce {self.reduce!r}")
        S = G.scatter_matrix(self.dtype)  # [B, V, E]
        Gm = G.gather_matrix(self.dtype)  # [B, E, V]

        def node_reduce(m):
            """E -> V reduce matching the flat layout's segment semantics
            (nn/chemprop.py::_node_reduce / nn/ops.py): mean divides by the
            real in-degree (floor 1), max over real in-edges with empty
            segments -> 0. Sum/mean stay MXU contractions; max runs one
            segment_max over the flattened batch."""
            if self.reduce == "sum":
                return jnp.einsum("bve,bed->bvd", S, m)
            if self.reduce == "mean":
                counts = S.sum(axis=-1)[..., None]  # real in-degree [B, V, 1]
                return jnp.einsum("bve,bed->bvd", S, m) / jnp.maximum(counts, 1.0)
            from notorch_tpu.nn.ops import segment_max

            B, E, d = m.shape
            V = G.nodes_per_graph
            ids = jnp.where(
                G.edge_mask, G.dst + V * jnp.arange(B, dtype=G.dst.dtype)[:, None], B * V
            ).reshape(-1)
            out = segment_max(m.reshape(B * E, d), ids, B * V + 1)
            return out[: B * V].reshape(B, V, d)

        node_feats = G.node_feats.astype(self.dtype)
        edge_hiddens = (
            jnp.einsum("bev,bvd->bed", Gm, node_feats) + G.edge_feats.astype(self.dtype)
        )

        names = ["layer"] * self.depth if self.shared else [f"layer_{i}" for i in range(self.depth)]
        layers = {}
        for n in names:
            if n not in layers:
                # param path layer_i/update/kernel — identical to the flat
                # ChempropBlock so weights are layout-interchangeable
                layers[n] = _Update(self.hidden_dim, self.bias, self.dtype, name=n)
        drop = nn.Dropout(self.dropout, deterministic=not training)

        for n in names:
            m = self.act(edge_hiddens)  # [B, E, d]
            node_messages = node_reduce(m)
            edge_messages = jnp.einsum("bev,bvd->bed", Gm, node_messages) - rev_pair_swap(m)
            out = drop(layers[n](edge_messages))
            edge_hiddens = edge_hiddens + out if self.residual else out

        node_hiddens = node_reduce(edge_hiddens)
        return G.update(node_feats=node_hiddens, edge_feats=edge_hiddens)


class DenseGraphEmbedding(nn.Module):
    """Type-index embedding for the dense layout (same tables/semantics as
    :class:`notorch_tpu.nn.embed.GraphEmbedding`)."""

    num_node_types: int
    num_edge_types: int
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> DenseBatchedGraph:
        from notorch_tpu.nn.embed import EmbeddingBagSum

        # same module tree as the flat GraphEmbedding, so parameters are
        # interchangeable between layouts
        node = EmbeddingBagSum(self.num_node_types, self.hidden_dim, self.dtype, name="node")
        edge = EmbeddingBagSum(self.num_edge_types, self.hidden_dim, self.dtype, name="edge")
        return G.update(node_feats=node(G.node_feats), edge_feats=edge(G.edge_feats))


def fused_block_apply(
    variables,
    G: DenseBatchedGraph,
    depth: int,
    residual: bool = True,
    mols_per_tile: int = 8,
    interpret: bool = False,
    matmul_dtype: str | None = None,
) -> DenseBatchedGraph:
    """Inference fast path: run a :class:`DenseChempropBlock`'s computation
    through the fused Pallas kernel (one VMEM-resident kernel for the whole
    block; see ``notorch_tpu.kernels.dense_mpnn``). Forward-only — use the
    module itself for training.

    Padded-lane contract: the kernel folds the reverse-message subtraction
    into its edge-to-edge operator, so the returned ``edge_feats`` on PADDED
    edge lanes differ from the jnp layouts (they never see the swap
    subtraction). Real lanes agree exactly; consume ``edge_feats`` through a
    mask (as the masked scatter here and every shipped readout/loss does) —
    reading padded lanes unmasked will diverge from the jnp layouts."""
    from notorch_tpu.kernels.dense_mpnn import fit_tile, fused_dense_mpnn_block

    # wide bins shrink the tile to fit scoped VMEM — same policy as training
    mols_per_tile = fit_tile(
        mols_per_tile, G.edge_feats.shape[1], G.node_feats.shape[0]
    )

    params = variables["params"]
    names = [f"layer_{i}" for i in range(depth)] if f"layer_{depth-1}" in params else ["layer"] * depth
    Ws = jnp.stack([params[n]["update"]["kernel"] for n in names])
    bs = jnp.stack([params[n]["update"]["bias"] for n in names])

    Gm = G.gather_matrix(G.node_feats.dtype)
    h0 = (
        jax.lax.dot_general(
            Gm, G.node_feats, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(G.edge_feats.dtype)
        + G.edge_feats
    )
    edge_hiddens = fused_dense_mpnn_block(
        h0, G.src, G.dst, G.edge_mask, Ws, bs,
        depth=depth, n_nodes=G.nodes_per_graph, residual=residual,
        mols_per_tile=mols_per_tile, interpret=interpret,
        matmul_dtype=matmul_dtype,
    )
    S = G.scatter_matrix(edge_hiddens.dtype)
    node_hiddens = jax.lax.dot_general(
        S, edge_hiddens, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(edge_hiddens.dtype)
    return G.update(node_feats=node_hiddens, edge_feats=edge_hiddens)


class FusedDenseChempropBlock(nn.Module):
    """D-MPNN block backed by the fused Pallas kernel (trainable via the
    custom-VJP wrappers). Parameters live per-layer under
    ``layer_i/update/{kernel,bias}`` — the SAME tree as the flat
    :class:`~notorch_tpu.nn.chemprop.ChempropBlock` and the jnp
    :class:`DenseChempropBlock`, so weights (and checkpoints) are
    layout-interchangeable; they are stacked at trace time for the kernel.
    On non-TPU backends the kernel runs in interpret mode, so the module is
    usable everywhere (tests run it on CPU).

    Dropout is not supported inside the fused kernel; use the jnp
    :class:`DenseChempropBlock` when training with edge dropout.

    Padded-lane contract (kernels.dense_mpnn._edge_adjacency): the fused
    kernels fold the reverse-message subtraction into the edge-to-edge
    operator, which changes the returned ``edge_feats`` on PADDED edge lanes
    relative to the jnp layouts; gradients additionally treat cotangents as
    supported on real lanes only. Real-lane values and gradients agree with
    the jnp layouts exactly. Every in-tree consumer (the masked scatter
    below, masked readouts, masked losses) satisfies both conditions — a
    custom module reading ``G.edge_feats`` after this block must apply
    ``G.edge_mask`` before comparing across layouts.
    """

    hidden_dim: int = DEFAULT_HIDDEN_DIM
    depth: int = 3
    residual: bool = True
    bias: bool = True
    # sum AND mean fold into the kernel's collapsed edge-to-edge operator
    # (mean is linear: rows scaled by 1/in-degree — kernels.dense_mpnn.
    # _edge_adjacency); max is genuinely non-foldable and routes to
    # DenseChempropBlock (models/dmpnn.py does this automatically for
    # build_dmpnn(reduce=...))
    reduce: str = "sum"
    mols_per_tile: int = 8
    # backward pass strategy:
    #   "stash"     — Pallas backward reading per-layer residuals the forward
    #                 stashed to HBM (no recompute; more HBM traffic) —
    #                 measured fastest on v5e (146.7M vs 127.2M edge-layers/s
    #                 for recompute, sorted groups; scripts/bench_train_step.py).
    #                 Peak-HBM cost: the stash holds (depth-1) * B * E * d * 4
    #                 bytes of residuals per step (e.g. depth 3, 512x128 edge
    #                 lanes, d=256: ~134 MB); on memory-constrained chips use
    #                 stash_dtype="bfloat16" (halves it) or backward=
    #                 "recompute" (no stash at all)
    #   "recompute" — Pallas backward, per-tile forward replay in VMEM
    #   "jnp"       — jnp recompute backward (debug/fallback)
    backward: str = "stash"
    # cast MXU operands inside the kernels (e.g. "bfloat16"); state stays f32
    matmul_dtype: str | None = None
    # store the stash backward's HBM residuals down-cast (e.g. "bfloat16"):
    # halves the residual traffic; gradients pick up ~bf16 rounding in the
    # ReLU mask / weight-grad operand. None (f32) is exact.
    stash_dtype: str | None = None
    # fuse the surrounding gather/scatter into the kernel (the v3
    # whole-encoder kernel): the [B,E,V]/[B,V,E] one-hot operators are
    # built in VMEM instead of HBM and h0 never round-trips. Only the
    # "stash" backward supports it.
    fuse_ends: bool = False

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> DenseBatchedGraph:
        if self.reduce not in ("sum", "mean"):
            raise NotImplementedError(
                "the fused Pallas block implements reduce='sum' and 'mean' "
                "(both fold into its collapsed linear edge operator); max is "
                "non-foldable — use DenseChempropBlock, build_dmpnn(reduce=...) "
                "routes there automatically"
            )
        from notorch_tpu.kernels.dense_mpnn import (
            fused_dense_encoder,
            fused_dense_mpnn_block_trainable,
            fused_dense_mpnn_block_trainable_fast,
            fused_dense_mpnn_block_trainable_stash,
        )

        per_layer = [
            _UpdateParams(self.hidden_dim, self.bias, name=f"layer_{i}")()
            for i in range(self.depth)
        ]
        Ws = jnp.stack([k for k, _ in per_layer])
        bs = jnp.stack([b for _, b in per_layer])

        from notorch_tpu.kernels.dense_mpnn import fit_tile

        B = G.node_feats.shape[0]
        # wide bins (full-lipo molecules push ladder bins to 256 edges)
        # shrink the tile to fit Mosaic's scoped VMEM — one shared policy
        # with the inference path (kernels.dense_mpnn.fit_tile)
        tile = fit_tile(self.mols_per_tile, G.edge_feats.shape[1], B)
        interpret = jax.default_backend() != "tpu"

        if self.fuse_ends:
            if self.backward != "stash":
                raise ValueError("fuse_ends requires backward='stash'")
            if not interpret and tile % 8 != 0:
                raise ValueError(
                    f"fuse_ends needs a multiple-of-8 tile on TPU (got {tile} "
                    f"for {G.edge_feats.shape[1]}-edge bins — wide bins shrink "
                    "the tile to fit VMEM); use fuse_ends=False for this batch"
                )
            node_hiddens, edge_hiddens = fused_dense_encoder(
                G.node_feats, G.edge_feats, G.src, G.dst, G.edge_mask, Ws, bs,
                self.depth, self.residual, max(tile, 1), interpret,
                self.matmul_dtype, self.stash_dtype, self.reduce,
            )
            return G.update(node_feats=node_hiddens, edge_feats=edge_hiddens)

        Gm = G.gather_matrix(G.node_feats.dtype)
        h0 = (
            jnp.einsum("bev,bvd->bed", Gm, G.node_feats).astype(G.edge_feats.dtype)
            + G.edge_feats
        )
        fn = {
            "recompute": fused_dense_mpnn_block_trainable_fast,
            "stash": fused_dense_mpnn_block_trainable_stash,
            "jnp": fused_dense_mpnn_block_trainable,
        }[self.backward]
        extra = (self.stash_dtype,) if self.backward == "stash" else ()
        edge_hiddens = fn(
            h0, G.src, G.dst, G.edge_mask, Ws, bs,
            self.depth, G.nodes_per_graph, self.residual, max(tile, 1), interpret,
            self.matmul_dtype, *extra, self.reduce,
        )
        S = G.scatter_matrix(edge_hiddens.dtype)
        if self.reduce == "mean":  # final E->V reduce: divide by in-degree
            S = S / jnp.maximum(S.sum(axis=-1, keepdims=True), 1.0)
        node_hiddens = jnp.einsum("bve,bed->bvd", S, edge_hiddens)
        return G.update(node_feats=node_hiddens, edge_feats=edge_hiddens)


class DenseSum(nn.Module):
    """Per-graph masked sum readout over the node axis: [B, V, d] -> [B, d]."""

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        mask = G.node_mask[..., None].astype(G.node_feats.dtype)
        return (G.node_feats * mask).sum(axis=1)


class DenseMean(nn.Module):
    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        mask = G.node_mask[..., None].astype(G.node_feats.dtype)
        total = (G.node_feats * mask).sum(axis=1)
        counts = jnp.maximum(mask.sum(axis=1), 1.0)
        return total / counts


class DenseMax(nn.Module):
    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        neg = jnp.where(G.node_mask[..., None], G.node_feats, -jnp.inf)
        out = neg.max(axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)


def _packed_segments(G: DenseBatchedGraph):
    if G.node_graph is None or G.n_mols is None:
        raise ValueError("packed readout needs a pack_graphs_dense batch")
    if G.n_shards != 1:
        raise ValueError(
            f"this packed batch carries {G.n_shards} chunk-local shards "
            "(pack_graphs_dense(n_shards>1)); its node_graph ids are only "
            "meaningful after a leading-axis split across a data mesh — "
            "run it through DenseSpmdTrainer, or pack with n_shards=1"
        )
    d = G.node_feats.shape[-1]
    flat = G.node_feats.reshape(-1, d)
    ids = G.node_graph.reshape(-1)
    return flat, ids, G.n_mols


def _masked_node_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the node axis of [B, V] scores, excluding padding slots;
    all-padding rows come out as zero weights (not NaN)."""
    neg = jnp.where(mask, scores, -jnp.inf)
    mx = jnp.max(neg, axis=1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(mask, jnp.exp(neg - mx), 0.0)
    return ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-12)


class PackedSum(nn.Module):
    """Per-MOLECULE sum readout over a bin-packed batch: [NB, V_b, d] ->
    [n_mols, d] via one segment-sum on ``node_graph`` (padding slots land in
    the extra trash segment and are dropped). Falls back to the dense
    per-molecule form when the batch carries no packing metadata, so one
    ``dense_packed`` model consumes both dense layouts."""

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        if G.node_graph is None:
            return DenseSum()(G, training)
        flat, ids, M = _packed_segments(G)
        return jax.ops.segment_sum(flat, ids, num_segments=M + 1)[:-1]


class PackedMean(nn.Module):
    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        if G.node_graph is None:
            return DenseMean()(G, training)
        flat, ids, M = _packed_segments(G)
        total = jax.ops.segment_sum(flat, ids, num_segments=M + 1)[:-1]
        ones = G.node_mask.reshape(-1, 1).astype(flat.dtype)
        counts = jax.ops.segment_sum(ones, ids, num_segments=M + 1)[:-1]
        return total / jnp.maximum(counts, 1.0)


class PackedMax(nn.Module):
    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        if G.node_graph is None:
            return DenseMax()(G, training)
        flat, ids, M = _packed_segments(G)
        out = jax.ops.segment_max(flat, ids, num_segments=M + 1)[:-1]
        return jnp.where(jnp.isfinite(out), out, 0.0)


class DenseGated(nn.Module):
    """Learned softmax-attention pooling over the dense node axis — the
    per-molecule-layout form of :class:`notorch_tpu.nn.agg.Gated` (reference
    ``notorch/nn/gnn/agg.py:50-63``). Same parameter tree (``a/kernel``), so
    weights are layout-interchangeable with the flat module."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        scores = nn.Dense(1, dtype=self.dtype, name="a")(G.node_feats).squeeze(-1)
        alpha = _masked_node_softmax(scores, G.node_mask)
        return (alpha[..., None] * G.node_feats.astype(alpha.dtype)).sum(axis=1)


class DenseSDPAttention(nn.Module):
    """Query-conditioned scaled-dot-product pooling over the dense node axis
    (reference ``agg.py:66-86``). ``Q`` is the per-graph query ``[B, d]``;
    when omitted (the factory path) a learned query vector is broadcast to
    every graph — same semantics as a 1-token cross-attention readout."""

    key_dim: int = DEFAULT_HIDDEN_DIM

    @nn.compact
    def __call__(
        self, G: DenseBatchedGraph, Q: jnp.ndarray | None = None, training: bool = False
    ) -> jnp.ndarray:
        d = G.node_feats.shape[-1]
        if Q is None:
            q = self.param("query", nn.initializers.lecun_normal(), (1, d))
            Q = jnp.broadcast_to(q, (G.n_graphs, d)).astype(G.node_feats.dtype)
        scores = (Q[:, None, :] * G.node_feats).sum(-1) / jnp.sqrt(float(self.key_dim))
        alpha = _masked_node_softmax(scores, G.node_mask)
        return (alpha[..., None] * G.node_feats.astype(alpha.dtype)).sum(axis=1)


class PackedGated(nn.Module):
    """Gated pooling for bin-packed batches: segment softmax over
    ``node_graph`` -> [n_mols, d]. Falls back to the dense per-molecule form
    when the batch carries no packing metadata, so one ``dense_packed`` model
    consumes both layouts."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, G: DenseBatchedGraph, training: bool = False) -> jnp.ndarray:
        scores = nn.Dense(1, dtype=self.dtype, name="a")(G.node_feats).squeeze(-1)
        if G.node_graph is None:
            alpha = _masked_node_softmax(scores, G.node_mask)
            return (alpha[..., None] * G.node_feats.astype(alpha.dtype)).sum(axis=1)
        from notorch_tpu.nn.ops import segment_softmax

        flat, ids, M = _packed_segments(G)
        alpha = segment_softmax(
            scores.reshape(-1), ids, M + 1, mask=G.node_mask.reshape(-1)
        )
        return jax.ops.segment_sum(
            alpha[:, None] * flat.astype(alpha.dtype), ids, num_segments=M + 1
        )[:-1]


class PackedSDPAttention(nn.Module):
    """SDP pooling for bin-packed batches; ``Q`` is per-molecule ``[n_mols,
    d]`` (learned broadcast query when omitted). Dense fallback as above."""

    key_dim: int = DEFAULT_HIDDEN_DIM

    @nn.compact
    def __call__(
        self, G: DenseBatchedGraph, Q: jnp.ndarray | None = None, training: bool = False
    ) -> jnp.ndarray:
        d = G.node_feats.shape[-1]
        q = (
            self.param("query", nn.initializers.lecun_normal(), (1, d))
            if Q is None
            else None
        )
        scale = 1.0 / jnp.sqrt(float(self.key_dim))
        if G.node_graph is None:
            if Q is None:
                Q = jnp.broadcast_to(q, (G.n_graphs, d)).astype(G.node_feats.dtype)
            scores = (Q[:, None, :] * G.node_feats).sum(-1) * scale
            alpha = _masked_node_softmax(scores, G.node_mask)
            return (alpha[..., None] * G.node_feats.astype(alpha.dtype)).sum(axis=1)
        from notorch_tpu.nn.ops import segment_softmax

        flat, ids, M = _packed_segments(G)
        if Q is None:
            Q = jnp.broadcast_to(q, (M, d)).astype(flat.dtype)
        q_full = jnp.concatenate([Q, jnp.zeros_like(Q[:1])], axis=0)  # trash row
        scores = (q_full[ids] * flat).sum(-1) * scale
        alpha = segment_softmax(scores, ids, M + 1, mask=G.node_mask.reshape(-1))
        return jax.ops.segment_sum(
            alpha[:, None] * flat.astype(alpha.dtype), ids, num_segments=M + 1
        )[:-1]

"""Per-cloud readout over ``batch_index`` (mirror of the graph readouts).

Capability parity: reference ``notorch/nn/spatial/agg.py:13-63`` with the
``Gated`` index-arg bug fixed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.point_cloud import BatchedPointCloud
from notorch_tpu.nn.ops import segment_max, segment_mean, segment_softmax, segment_sum


def _n(P: BatchedPointCloud) -> int:
    return P.n_graphs + 1


class Sum(nn.Module):
    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False, **kw) -> jnp.ndarray:
        return segment_sum(P.node_feats, P.batch_index, _n(P))[: P.n_graphs]


class Mean(nn.Module):
    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False, **kw) -> jnp.ndarray:
        return segment_mean(P.node_feats, P.batch_index, _n(P))[: P.n_graphs]


class Max(nn.Module):
    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False, **kw) -> jnp.ndarray:
        return segment_max(P.node_feats, P.batch_index, _n(P))[: P.n_graphs]


class Gated(nn.Module):
    input_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False, **kw) -> jnp.ndarray:
        scores = nn.Dense(1, dtype=self.dtype, name="a")(P.node_feats).squeeze(-1)
        alpha = segment_softmax(scores, P.batch_index, _n(P), mask=P.node_mask)
        return segment_sum(alpha[:, None] * P.node_feats, P.batch_index, _n(P))[: P.n_graphs]


class SDPAttention(nn.Module):
    key_dim: int = DEFAULT_HIDDEN_DIM

    @nn.compact
    def __call__(
        self, P: BatchedPointCloud, Q: jnp.ndarray, training: bool = False, **kw
    ) -> jnp.ndarray:
        q_full = jnp.concatenate([Q, jnp.zeros_like(Q[:1])], axis=0)
        scores = (q_full[P.batch_index] * P.node_feats).sum(-1) / jnp.sqrt(float(self.key_dim))
        alpha = segment_softmax(scores, P.batch_index, _n(P), mask=P.node_mask)
        return segment_sum(alpha[:, None] * P.node_feats, P.batch_index, _n(P))[: P.n_graphs]

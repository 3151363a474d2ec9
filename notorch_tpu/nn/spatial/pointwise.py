"""Pointwise modules for point clouds.

Capability parity: reference ``notorch/nn/spatial/pointwise.py`` —
``PointwiseEmbed`` (EmbeddingBag-sum node embedding) and ``Pointwise`` (lift
any feature module onto ``P.node_feats``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.point_cloud import BatchedPointCloud
from notorch_tpu.nn.embed import EmbeddingBagSum
from notorch_tpu.transforms.vocab import DEFAULT_NUM_ATOM_TYPES


class PointwiseEmbed(nn.Module):
    num_types: int = DEFAULT_NUM_ATOM_TYPES
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False) -> BatchedPointCloud:
        embed = EmbeddingBagSum(self.num_types, self.hidden_dim, self.dtype, name="node")
        return P.update(node_feats=embed(P.node_feats))


class Pointwise(nn.Module):
    """Apply ``module`` to ``P.node_feats`` and return the updated cloud."""

    module: nn.Module

    @nn.compact
    def __call__(self, P: BatchedPointCloud, training: bool = False) -> BatchedPointCloud:
        return P.update(node_feats=self.module(P.node_feats, training=training))

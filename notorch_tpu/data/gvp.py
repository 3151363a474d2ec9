"""Dual-rank (scalar, vector) feature containers for GVP-family models.

Capability parity: reference ``notorch/data/models/gvp.py`` —
``DualRankFeatures`` (scalar ``[*b, ds]`` + vector ``[*b, 3, dv]`` features
with batch-shape agreement) and the GVP point cloud (a point cloud whose
node features are dual-rank). The reference file is partially stale
(attribute bugs, SURVEY §2.4); this is the working equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from notorch_tpu.data.point_cloud import BatchedPointCloud


class DualRankFeatures(struct.PyTreeNode):
    scalar: jnp.ndarray  # [*b, ds]
    vector: jnp.ndarray  # [*b, 3, dv]

    def __post_init__(self):
        s, v = self.scalar, self.vector
        if hasattr(s, "shape") and hasattr(v, "shape"):
            if s.shape[:-1] != v.shape[:-2]:
                raise ValueError(
                    f"batch shapes disagree: scalar {s.shape[:-1]} vs vector {v.shape[:-2]}"
                )

    @property
    def batch_shape(self) -> tuple:
        return self.scalar.shape[:-1]

    def astuple(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        return self.scalar, self.vector


class GVPPointCloud(struct.PyTreeNode):
    """A batched point cloud carrying dual-rank node features."""

    features: DualRankFeatures
    cloud: BatchedPointCloud

    def update(self, **kwargs) -> "GVPPointCloud":
        return self.replace(**kwargs)

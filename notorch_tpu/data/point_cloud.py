"""Point-cloud data model: 3D molecular systems.

Capability parity: reference ``notorch/data/models/point_cloud.py`` —
``PointCloud`` (node type ids + coordinates) and its batched form. TPU-first:
the batched form is a padded, static-shape pytree like ``BatchedGraph``; the
neighbor topology is NOT stored (it is recomputed each forward pass under a
fixed max-degree budget — see ``notorch_tpu.nn.spatial.neighbors``), matching
the reference's dynamic ``radius_graph``-in-forward design (schnet.py:41).
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclass
class PointCloud:
    node_types: np.ndarray  # [N, t] int32
    coords: np.ndarray  # [N, 3] float32

    @property
    def num_nodes(self) -> int:
        return len(self.node_types)


class BatchedPointCloud(struct.PyTreeNode):
    node_feats: jnp.ndarray  # [N_cap, t] ints or [N_cap, d] floats
    coords: jnp.ndarray  # [N_cap, 3]
    batch_index: jnp.ndarray  # [N_cap] i32, padding -> n_graphs
    node_mask: jnp.ndarray  # [N_cap] bool
    num_graphs_real: jnp.ndarray  # [] i32
    n_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def num_nodes(self) -> int:
        return self.node_feats.shape[0]

    def __len__(self) -> int:
        return self.n_graphs

    def update(self, **kwargs) -> "BatchedPointCloud":
        return self.replace(**kwargs)


def pad_point_clouds(
    clouds: Iterable[PointCloud],
    node_cap: int,
    graph_cap: int | None = None,
    np_out: bool = False,
) -> BatchedPointCloud:
    clouds = list(clouds)
    n = len(clouds)
    graph_cap = graph_cap if graph_cap is not None else n
    total = sum(c.num_nodes for c in clouds)
    if total > node_cap:
        raise ValueError(f"{total} points exceed node_cap={node_cap}")

    t = clouds[0].node_types.shape[1] if clouds else 1
    node_types = np.zeros((node_cap, t), dtype=np.int32)
    # padding coords far away so they never enter any radius neighborhood
    coords = np.full((node_cap, 3), 1e9, dtype=np.float32)
    batch_index = np.full(node_cap, graph_cap, dtype=np.int32)
    mask = np.zeros(node_cap, dtype=bool)

    off = 0
    for i, c in enumerate(clouds):
        N = c.num_nodes
        node_types[off : off + N] = c.node_types
        coords[off : off + N] = c.coords
        batch_index[off : off + N] = i
        mask[off : off + N] = True
        off += N

    conv = (lambda x: x) if np_out else jnp.asarray
    return BatchedPointCloud(
        node_feats=conv(node_types),
        coords=conv(coords),
        batch_index=conv(batch_index),
        node_mask=conv(mask),
        num_graphs_real=conv(np.asarray(n, dtype=np.int32)),
        n_graphs=graph_cap,
    )

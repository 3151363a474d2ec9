"""Prebuilt spatial (3D) model recipes: SchNet and GVP property predictors.

Composes the spatial stack (pointwise embed -> SchNet/GVP block -> spatial
readout -> MLP head) through the same declarative Model as the graph models,
so point-cloud property prediction gets the full train/eval/predict loop.
"""

from __future__ import annotations

import optax

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.model.model import Model, fill_pred_transform_keys
from notorch_tpu.models.dmpnn import _HEAD_WIDTH, _LOSSES
from notorch_tpu.nn.mlp import MLP
from notorch_tpu.nn.spatial import agg as spatial_agg
from notorch_tpu.nn.spatial.gvp import GvpGNNBlock
from notorch_tpu.nn.spatial.pointwise import PointwiseEmbed
from notorch_tpu.nn.spatial.schnet import SchnetBlock
from notorch_tpu.transforms.vocab import DEFAULT_NUM_ATOM_TYPES

SPATIAL_AGGREGATIONS = {
    "sum": spatial_agg.Sum,
    "mean": spatial_agg.Mean,
    "max": spatial_agg.Max,
    "gated": spatial_agg.Gated,
}


def build_spatial_model(
    backbone: str = "schnet",  # "schnet" | "gvp"
    num_tasks: int = 1,
    task: str = "regression",
    hidden_dim: int = DEFAULT_HIDDEN_DIM,
    depth: int = 3,
    radius: float = 5.0,
    max_neighbors: int = 16,
    neighbor_window: int | None = None,
    aggregation: str = "sum",
    ffn_layers: int = 1,
    num_node_types: int = DEFAULT_NUM_ATOM_TYPES,
    learning_rate: float = 1e-3,
    optimizer: optax.GradientTransformation | None = None,
    transforms: dict | None = None,
    target_key: str = "targets.y",
) -> Model:
    # neighbor_window: banded neighbor search — valid whenever every cloud
    # has <= window+1 atoms (O(N*(2W+1)) distance work instead of O(N^2);
    # see notorch_tpu.nn.spatial.neighbors.radius_neighbors)
    if backbone == "schnet":
        block = SchnetBlock(
            hidden_dim=hidden_dim, depth=depth, radius=radius,
            max_neighbors=max_neighbors, neighbor_window=neighbor_window,
        )
    elif backbone == "gvp":
        block = GvpGNNBlock(
            scalar_dim=hidden_dim,
            vector_dim=max(hidden_dim // 8, 4),
            depth=depth,
            radius=radius,
            max_neighbors=max_neighbors,
            neighbor_window=neighbor_window,
        )
    else:
        raise ValueError(f"unknown spatial backbone {backbone!r}")

    per_task = _HEAD_WIDTH.get(task, 2)
    output_size = num_tasks if per_task == 1 else (num_tasks, per_task)

    modules = {
        "embed": {
            "module": PointwiseEmbed(num_types=num_node_types, hidden_dim=hidden_dim),
            "in_keys": ["inputs.P"],
            "out_keys": ["P"],
        },
        "backbone": {"module": block, "in_keys": ["embed.P"], "out_keys": ["P"]},
        "readout": {
            "module": SPATIAL_AGGREGATIONS[aggregation](),
            "in_keys": ["backbone.P"],
            "out_keys": ["H"],
        },
        "ffn": {
            "module": MLP(
                input_dim=hidden_dim,
                output_size=output_size,
                hidden_dim=hidden_dim,
                num_layers=ffn_layers,
            ),
            "in_keys": ["readout.H"],
            "out_keys": ["preds"],
        },
    }
    losses = {
        "loss": {
            "fn": _LOSSES[task](),
            "in_keys": {
                "preds": "ffn.preds",
                "targets": target_key,
                "mask": f"{target_key}_mask",
            },
        }
    }
    return Model(
        modules=modules,
        losses=losses,
        transforms=fill_pred_transform_keys(transforms, "ffn.preds"),
        optimizer=optimizer if optimizer is not None else optax.adam(learning_rate),
    )

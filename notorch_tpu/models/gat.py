"""Graph-attention property-predictor recipe (``model.kind: gat``).

The reference ships graph attention only as (broken) layer classes
(``notorch/nn/gnn/attention.py:8,42`` — NameError-level bugs, SURVEY §2.4);
here it is a first-class recipe: embed -> depth-stacked GATv2 (or
edge-biased dot-product "graph transformer") -> readout -> FFN, trainable
from a YAML config (``configs/gat_regression.yaml``) with the same task
plumbing as the D-MPNN recipes. Flat layout: the attention layers are
segment-softmax/segment-sum shaped, which XLA compiles to the same
scatter-free fusions as the flat D-MPNN path."""

from __future__ import annotations

from typing import Sequence

import optax

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.model.model import Model, fill_pred_transform_keys
from notorch_tpu.models.dmpnn import AGGREGATIONS, _HEAD_WIDTH, _LOSSES
from notorch_tpu.nn.attention import GATBlock
from notorch_tpu.nn.embed import GraphEmbedding
from notorch_tpu.nn.mlp import MLP
from notorch_tpu.tasks import metrics as M


def build_gat(
    num_tasks: int = 1,
    task: str = "regression",
    num_classes: int = 2,
    hidden_dim: int = DEFAULT_HIDDEN_DIM,
    depth: int = 3,
    num_heads: int = 4,
    attention: str = "gatv2",
    dropout: float = 0.0,
    aggregation: str = "mean",
    ffn_layers: int = 1,
    learning_rate: float = 1e-4,
    optimizer: optax.GradientTransformation | None = None,
    transforms: dict | None = None,
    target_key: str = "targets.y",
    num_node_types: int | None = None,
    num_edge_types: int | None = None,
    metrics: dict | None = None,
    dtype=None,
) -> Model:
    """Embed -> GATBlock -> readout -> FFN over the flat batched graph."""
    import jax.numpy as jnp

    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    dtype = dtype or jnp.float32
    if aggregation not in AGGREGATIONS:
        raise ValueError(
            f"unknown aggregation {aggregation!r}; options: {sorted(AGGREGATIONS)}"
        )

    embed_kwargs = {}
    if num_node_types is not None:
        embed_kwargs["num_node_types"] = num_node_types
    if num_edge_types is not None:
        embed_kwargs["num_edge_types"] = num_edge_types

    per_task = _HEAD_WIDTH.get(task, num_classes)
    output_size: int | Sequence[int] = (
        num_tasks if per_task == 1 else (num_tasks, per_task)
    )

    agg_kwargs = {}
    if aggregation == "sdp":
        agg_kwargs["key_dim"] = hidden_dim

    modules = {
        "embed": {
            "module": GraphEmbedding(hidden_dim=hidden_dim, dtype=dtype, **embed_kwargs),
            "in_keys": ["inputs.G"],
            "out_keys": ["G"],
        },
        "mp": {
            "module": GATBlock(
                hidden_dim=hidden_dim,
                depth=depth,
                num_heads=num_heads,
                attention=attention,
                dropout=dropout,
                dtype=dtype,
            ),
            "in_keys": ["embed.G"],
            "out_keys": ["G"],
        },
        "readout": {
            "module": AGGREGATIONS[aggregation](**agg_kwargs),
            "in_keys": ["mp.G"],
            "out_keys": ["H"],
        },
        "ffn": {
            "module": MLP(
                input_dim=hidden_dim,
                output_size=output_size,
                hidden_dim=hidden_dim,
                num_layers=ffn_layers,
                dropout=dropout,
                dtype=dtype,
            ),
            "in_keys": ["readout.H"],
            "out_keys": ["preds"],
        },
    }

    loss_fn = _LOSSES[task]()
    losses = {
        task if task != "regression" else "mse": {
            "fn": loss_fn,
            "in_keys": {
                "preds": "ffn.preds",
                "targets": target_key,
                "mask": f"{target_key}_mask",
            },
            "weight": 1.0,
        }
    }

    default_metrics = {}
    if task == "regression":
        keys = {
            "preds": "ffn.preds",
            "targets": target_key,
            "mask": f"{target_key}_mask",
        }
        default_metrics = {
            "rmse": {"fn": M.RMSE(), "in_keys": keys},
            "mae": {"fn": M.MAE(), "in_keys": keys},
        }

    return Model(
        modules=modules,
        losses=losses,
        metrics=metrics if metrics is not None else default_metrics,
        transforms=fill_pred_transform_keys(transforms, "ffn.preds"),
        optimizer=optimizer if optimizer is not None else optax.adam(learning_rate),
    )

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


def resolve_gat_layout(layout: str = "auto", *, attention: str = "gatv2") -> str:
    """``auto`` -> dense_packed for BOTH stacks. The sdp (transformer)
    layer becomes batched MXU matmuls over packed bins (measured 161.7M
    fwd / 37.0M train edge-updates/s on v5e with lane-aligned 128x256 bins
    vs 10.2M / 2.6M flat). GATv2 goes dense too (round 5): its LeakyReLU
    score is not q.k^T-factorizable, but it only needs values at EDGE
    positions — computed in edge space and scattered through the factored-
    VJP contraction (``nn/attention_dense.DenseGATv2Layer``; flat-oracle
    parity-tested; 126.2M fwd / 29.1M train on v5e = 10x / 6.2x flat)."""
    if layout != "auto":
        return layout
    return "dense_packed"


def gat_loader_kwargs(layout: str) -> dict:
    """DataLoader kwargs for the attention stack's packed bins: LANE-ALIGNED
    V_b=128 / E_b=256 (the default V_b = E_b//2+8 heuristic gives 136, which
    pads every [.., V] attention op to 256 lanes; measured +32% fwd / +27%
    train — BASELINE.md round 4). One source of truth for the train, eval,
    predict, and serving loaders."""
    if layout == "dense_packed":
        return {"bin_edges": 256, "bin_nodes": 128}
    return {}


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
    layout: str = "auto",
) -> Model:
    """Embed -> GATBlock -> readout -> FFN. ``layout="auto"``: dense-packed
    bins for the sdp (graph-transformer) stack, flat for GATv2 — see
    :func:`resolve_gat_layout`."""
    import jax.numpy as jnp

    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    dtype = dtype or jnp.float32
    if aggregation not in AGGREGATIONS:
        raise ValueError(
            f"unknown aggregation {aggregation!r}; options: {sorted(AGGREGATIONS)}"
        )
    layout = resolve_gat_layout(layout, attention=attention)

    embed_kwargs = {}
    if num_node_types is not None:
        embed_kwargs["num_node_types"] = num_node_types
    if num_edge_types is not None:
        embed_kwargs["num_edge_types"] = num_edge_types

    per_task = _HEAD_WIDTH.get(task, num_classes)
    output_size: int | Sequence[int] = (
        num_tasks if per_task == 1 else (num_tasks, per_task)
    )

    if layout in ("dense", "dense_packed"):
        from notorch_tpu.nn.attention_dense import DenseGATBlock
        from notorch_tpu.nn.chemprop_dense import (
            DenseGated,
            DenseGraphEmbedding,
            DenseMax,
            DenseMean,
            DenseSDPAttention,
            DenseSum,
            PackedGated,
            PackedMax,
            PackedMean,
            PackedSDPAttention,
            PackedSum,
        )
        from notorch_tpu.transforms.vocab import (
            DEFAULT_NUM_ATOM_TYPES,
            DEFAULT_NUM_BOND_TYPES,
        )

        embed_mod = DenseGraphEmbedding(
            num_node_types=embed_kwargs.get("num_node_types", DEFAULT_NUM_ATOM_TYPES),
            num_edge_types=embed_kwargs.get("num_edge_types", DEFAULT_NUM_BOND_TYPES),
            hidden_dim=hidden_dim,
            dtype=dtype,
        )
        mp_mod = DenseGATBlock(
            hidden_dim=hidden_dim,
            depth=depth,
            num_heads=num_heads,
            attention=attention,
            dropout=dropout,
            dtype=dtype,
        )
        aggs = (
            {
                "sum": PackedSum(),
                "mean": PackedMean(),
                "max": PackedMax(),
                "gated": PackedGated(dtype=dtype),
                "sdp": PackedSDPAttention(key_dim=hidden_dim),
            }
            if layout == "dense_packed"
            else {
                "sum": DenseSum(),
                "mean": DenseMean(),
                "max": DenseMax(),
                "gated": DenseGated(dtype=dtype),
                "sdp": DenseSDPAttention(key_dim=hidden_dim),
            }
        )
        readout_mod = aggs[aggregation]
    else:
        embed_mod = GraphEmbedding(hidden_dim=hidden_dim, dtype=dtype, **embed_kwargs)
        mp_mod = GATBlock(
            hidden_dim=hidden_dim,
            depth=depth,
            num_heads=num_heads,
            attention=attention,
            dropout=dropout,
            dtype=dtype,
        )
        agg_kwargs = {}
        if aggregation == "sdp":
            agg_kwargs["key_dim"] = hidden_dim
        readout_mod = AGGREGATIONS[aggregation](**agg_kwargs)

    modules = {
        "embed": {
            "module": embed_mod,
            "in_keys": ["inputs.G"],
            "out_keys": ["G"],
        },
        "mp": {
            "module": mp_mod,
            "in_keys": ["embed.G"],
            "out_keys": ["G"],
        },
        "readout": {
            "module": readout_mod,
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

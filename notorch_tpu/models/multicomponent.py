"""Multi-component models: N molecular inputs -> N encoders -> concat -> head.

Capability parity: the reference's dead ``MulticomponentMPNN``
(lightning_models/multi.py:40-48) — per-component message passing, per-
component readout, concatenated fingerprint, shared FFN head — rebuilt as
declarative composition. Covers the reaction+solvent config (BASELINE.json
config 4) together with :mod:`notorch_tpu.transforms.reaction`.
"""

from __future__ import annotations

import flax.linen as nn
import optax

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.model.model import Model, fill_pred_transform_keys
from notorch_tpu.models.dmpnn import AGGREGATIONS, _HEAD_WIDTH, _LOSSES
from notorch_tpu.nn.chemprop import ChempropBlock
from notorch_tpu.nn.embed import GraphEmbedding
from notorch_tpu.nn.glue import Cat
from notorch_tpu.nn.mlp import MLP


class LayerNormModule(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        return nn.LayerNorm()(x)


def build_multicomponent_dmpnn(
    component_keys: list[str],
    num_tasks: int = 1,
    task: str = "regression",
    hidden_dim: int = DEFAULT_HIDDEN_DIM,
    depth: int = 3,
    dropout: float = 0.0,
    aggregation: str = "mean",
    ffn_layers: int = 1,
    shared_encoder: bool = False,
    normalize_fingerprint: bool = True,
    norm: str = "layer",  # "layer" | "batch" (reference multi.py:44 uses BatchNorm)
    num_node_types: dict[str, int] | None = None,
    num_edge_types: dict[str, int] | None = None,
    learning_rate: float = 1e-4,
    optimizer: optax.GradientTransformation | None = None,
    transforms: dict | None = None,
    target_key: str = "targets.y",
    extra_features_key: str | None = None,
    extra_features_dim: int = 0,
) -> Model:
    """``component_keys``: input keys, e.g. ``["inputs.G1", "inputs.G2"]``.

    ``shared_encoder=True`` reuses one embed+MPNN for every component
    (reference's shared-weights multi-input option); otherwise each component
    gets its own encoder. Per-component vocab sizes come from
    ``num_node_types``/``num_edge_types`` keyed by component key (e.g. a CGR
    reaction component has a wider vocabulary than a plain molecule).
    """
    modules: dict = {}
    readout_keys = []

    shared_embed = shared_mp = None
    if shared_encoder:
        kw = {}
        if num_node_types:
            kw["num_node_types"] = max(num_node_types.values())
        if num_edge_types:
            kw["num_edge_types"] = max(num_edge_types.values())
        shared_embed = GraphEmbedding(hidden_dim=hidden_dim, **kw)
        shared_mp = ChempropBlock(hidden_dim=hidden_dim, depth=depth, dropout=dropout)

    for i, key in enumerate(component_keys):
        kw = {}
        if num_node_types and key in num_node_types:
            kw["num_node_types"] = num_node_types[key]
        if num_edge_types and key in num_edge_types:
            kw["num_edge_types"] = num_edge_types[key]
        embed = shared_embed if shared_encoder else GraphEmbedding(hidden_dim=hidden_dim, **kw)
        mp = (
            shared_mp
            if shared_encoder
            else ChempropBlock(hidden_dim=hidden_dim, depth=depth, dropout=dropout)
        )
        modules[f"embed_{i}"] = {"module": embed, "in_keys": [key], "out_keys": ["G"]}
        modules[f"mp_{i}"] = {"module": mp, "in_keys": [f"embed_{i}.G"], "out_keys": ["G"]}
        modules[f"readout_{i}"] = {
            "module": AGGREGATIONS[aggregation](),
            "in_keys": [f"mp_{i}.G"],
            "out_keys": ["H"],
        }
        readout_keys.append(f"readout_{i}.H")

    # optional molecule-level extra features concatenated into the
    # fingerprint (reference MulticomponentMPNN.fingerprint X_f, multi.py:48)
    if extra_features_key is not None:
        readout_keys = readout_keys + [extra_features_key]
    modules["fingerprint"] = {"module": Cat(), "in_keys": readout_keys, "out_keys": ["H"]}
    head_in = "fingerprint.H"
    if normalize_fingerprint:
        from notorch_tpu.nn.glue import BatchNorm

        modules["norm"] = {
            "module": BatchNorm() if norm == "batch" else LayerNormModule(),
            "in_keys": ["fingerprint.H"],
            "out_keys": ["H"],
        }
        head_in = "norm.H"

    per_task = _HEAD_WIDTH.get(task, 2)
    output_size = num_tasks if per_task == 1 else (num_tasks, per_task)
    modules["ffn"] = {
        "module": MLP(
            input_dim=hidden_dim * len(component_keys) + extra_features_dim,
            output_size=output_size,
            hidden_dim=hidden_dim,
            num_layers=ffn_layers,
            dropout=dropout,
        ),
        "in_keys": [head_in],
        "out_keys": ["preds"],
    }

    losses = {
        "loss": {
            "fn": _LOSSES[task](),
            "in_keys": {
                "preds": "ffn.preds",
                "targets": target_key,
                "mask": f"{target_key}_mask",
            },
            "weight": 1.0,
        }
    }
    return Model(
        modules=modules,
        losses=losses,
        transforms=fill_pred_transform_keys(transforms, "ffn.preds"),
        optimizer=optimizer if optimizer is not None else optax.adam(learning_rate),
    )

"""Pinned pure-numpy oracle of the D-MPNN recurrence.

This is the allclose ground truth for per-layer hidden-state parity
(BASELINE.md "Per-layer hidden states vs reference D-MPNN"): it implements
exactly the recurrence of the reference ``notorch/nn/gnn/chemprop.py:28-88``
(embedding-bag-sum -> depth x [act, E->V scatter, gather-subtract, linear]
-> final E->V scatter), with no JAX anywhere.
"""

from __future__ import annotations

import numpy as np


def embedding_bag_sum(table: np.ndarray, type_ids: np.ndarray) -> np.ndarray:
    return table[type_ids].sum(axis=-2)


def scatter_sum(data: np.ndarray, index: np.ndarray, size: int) -> np.ndarray:
    out = np.zeros((size,) + data.shape[1:], dtype=data.dtype)
    np.add.at(out, index, data)
    return out


def relu(x):
    return np.maximum(x, 0.0)


def chemprop_block(
    node_feats: np.ndarray,  # [V, d] float (already embedded)
    edge_feats: np.ndarray,  # [E, d] float
    src: np.ndarray,
    dst: np.ndarray,
    rev: np.ndarray,
    weights: list[np.ndarray],  # per-layer [d, d] kernels
    biases: list[np.ndarray],  # per-layer [d]
    residual: bool = True,
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Returns (node_hiddens, edge_hiddens, per-layer edge hiddens)."""
    V = len(node_feats)
    edge_hiddens = node_feats[src] + edge_feats
    per_layer = []
    for W, b in zip(weights, biases):
        messages = relu(edge_hiddens)
        node_messages = scatter_sum(messages, dst, V)
        edge_messages = node_messages[src] - messages[rev]
        out = edge_messages @ W + b
        edge_hiddens = edge_hiddens + out if residual else out
        per_layer.append(edge_hiddens.copy())
    node_hiddens = scatter_sum(edge_hiddens, dst, V)
    return node_hiddens, edge_hiddens, per_layer

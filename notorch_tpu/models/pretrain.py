"""Self-supervised pretraining: masked atom-type prediction.

The PCQM4Mv2-scale pretraining capability (BASELINE.json config 5): mask a
fraction of atoms' type-index features (pointing them at each family's <UNK>
slot), run message passing, and predict each masked atom's element id from
its node hidden. Pure graph-side SSL — no labels required; the reference's
``SelfSupervisedLoss`` pass-through (loss.py:24) is the hook it anticipated.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM
from notorch_tpu.data.graph import BatchedGraph, Graph
from notorch_tpu.model.model import Model
from notorch_tpu.nn.chemprop import ChempropBlock
from notorch_tpu.nn.embed import GraphEmbedding
from notorch_tpu.tasks.losses import masked_reduce
from notorch_tpu.transforms.atom import MultiTypeAtomTransform
from notorch_tpu.transforms.graph import MolToGraph
from notorch_tpu.transforms.vocab import ELEMENTS


@dataclass
class MaskAtoms:
    """Transform: Graph -> Graph with masked atoms + per-node labels.

    Masked atoms have every feature family pointed at its <UNK> slot; labels
    are the original element ids (the primary identity family). Labels for
    unmasked atoms are -1.
    """

    _in_key_: ClassVar[str] = "G"
    _out_key_: ClassVar[str] = "G"

    mask_rate: float = 0.15
    seed: int = 0
    atom_transform: MultiTypeAtomTransform = field(default_factory=MultiTypeAtomTransform)

    def __post_init__(self):
        self._rg = np.random.default_rng(self.seed)
        # per-family <UNK> ids under the offset scheme
        sizes = self.atom_transform.sizes
        offsets = self.atom_transform.offset
        self._unk_row = np.array(
            [o + s - 1 for o, s in zip(offsets, sizes)], dtype=np.int32
        )

    def __call__(self, g: Graph) -> Graph:
        V = g.num_nodes
        masked = self._rg.random(V) < self.mask_rate
        if not masked.any():
            masked[self._rg.integers(0, V)] = True
        node_types = g.node_types.copy()
        labels = np.full(V, -1, dtype=np.int32)
        labels[masked] = node_types[masked, 0]  # element family id (offset 0)
        node_types[masked] = self._unk_row
        out = Graph(
            node_types=node_types,
            edge_types=g.edge_types,
            src=g.src,
            dst=g.dst,
            rev=g.rev,
        )
        out.node_labels = labels  # carried to collation
        return out

    @staticmethod
    def collate(graphs, node_cap=None, edge_cap=None):
        bg = MolToGraph.collate(graphs, node_cap, edge_cap)
        V_cap = bg.num_nodes
        labels = np.full(V_cap, -1, dtype=np.int32)
        off = 0
        for g in graphs:
            labels[off : off + g.num_nodes] = g.node_labels
            off += g.num_nodes
        return bg, jnp.asarray(labels)


class NodeHead(nn.Module):
    """Per-node classification head over node hiddens."""

    num_classes: int
    hidden_dim: int = DEFAULT_HIDDEN_DIM

    @nn.compact
    def __call__(self, G: BatchedGraph, training: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, name="proj")(G.node_feats)
        h = nn.relu(h)
        return nn.Dense(self.num_classes, name="out")(h)


@dataclass(frozen=True)
class MaskedNodeCrossEntropy:
    """CE over masked node positions only (labels == -1 are ignored).

    ``psum_axis``: with molecule-partitioned (node-sharded) batches, each
    shard sees a disjoint node subset, so the global masked mean is the psum
    of local numerators over the psum of local counts — the loss value comes
    out REPLICATED across graph shards (and thus compatible with the
    SpmdTrainer's count-once gating)."""

    psum_axis: str | None = None

    def __call__(self, logits, labels, **kw):
        mask = (labels >= 0).astype(logits.dtype)
        safe = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1).squeeze(-1)
        if self.psum_axis is None:
            return masked_reduce(nll[:, None], mask[:, None] > 0)
        num = jax.lax.psum((nll * mask).sum(), self.psum_axis)
        den = jax.lax.psum(mask.sum(), self.psum_axis)
        return num / jnp.maximum(den, 1.0)


def build_masked_atom_pretrainer(
    hidden_dim: int = DEFAULT_HIDDEN_DIM,
    depth: int = 3,
    num_elements: int = len(ELEMENTS) + 1,
    learning_rate: float = 1e-3,
    optimizer=None,
    graph_axis: str | None = None,
    partition: str = "molecule",
) -> Model:
    """embed -> chemprop -> per-node head -> masked CE on element identity.

    ``graph_axis`` + ``partition`` select the graph-partitioned scheme
    (see :func:`notorch_tpu.models.dmpnn.build_dmpnn`): ``"molecule"``
    (default) shards nodes+edges by molecule — message passing is local and
    only the loss's scalar numerator/denominator cross shards; ``"replicate"``
    is the legacy full-[V,d]-psum-per-layer edge partitioning.
    """
    if partition not in ("molecule", "replicate"):
        raise ValueError(f"unknown partition scheme {partition!r}")
    mp_psum_axis = graph_axis if partition == "replicate" else None
    loss_psum_axis = graph_axis if partition == "molecule" else None
    modules = {
        "embed": {
            "module": GraphEmbedding(hidden_dim=hidden_dim),
            "in_keys": ["inputs.G"],
            "out_keys": ["G"],
        },
        "mp": {
            "module": ChempropBlock(
                hidden_dim=hidden_dim, depth=depth, psum_axis=mp_psum_axis
            ),
            "in_keys": ["embed.G"],
            "out_keys": ["G"],
        },
        "head": {
            "module": NodeHead(num_classes=num_elements, hidden_dim=hidden_dim),
            "in_keys": ["mp.G"],
            "out_keys": ["logits"],
        },
    }
    losses = {
        "masked_ce": {
            "fn": MaskedNodeCrossEntropy(psum_axis=loss_psum_axis),
            "in_keys": ["head.logits", "inputs.node_labels"],
            "weight": 1.0,
        }
    }
    return Model(
        modules=modules,
        losses=losses,
        optimizer=optimizer if optimizer is not None else optax.adam(learning_rate),
    )

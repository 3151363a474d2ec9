"""notorch-tpu: a TPU-native molecular message-passing framework.

The capabilities of davidegraff/notorch (chemprop-lineage D-MPNN property
prediction with declaratively composed models), redesigned for
JAX/XLA/Pallas on TPU. See README.md for the architecture tour and
PARITY.md for the reference component map.
"""

__version__ = "0.1.0"

from notorch_tpu.data.batching import (
    DataLoader,
    PrefetchLoader,
    StackedBatch,
    Subset,
    random_split,
    stack_trees,
)
from notorch_tpu.data.dataset import (
    DatabaseManager,
    MolecularDataset,
    TargetSpec,
    TransformManager,
)
from notorch_tpu.data.dense import DenseBatchedGraph, pad_graphs_dense
from notorch_tpu.data.graph import BatchedGraph, Graph, pad_graphs, with_csr_packing
from notorch_tpu.data.splits import scaffold_split
from notorch_tpu.model.model import Model, TrainState, fill_pred_transform_keys
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.models.multicomponent import build_multicomponent_dmpnn
from notorch_tpu.models.pretrain import build_masked_atom_pretrainer
from notorch_tpu.training.checkpoint import Checkpointer
from notorch_tpu.training.loop import evaluate, fit, predict
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol

__all__ = [
    "BatchedGraph",
    "Checkpointer",
    "DataLoader",
    "DatabaseManager",
    "DenseBatchedGraph",
    "Graph",
    "Model",
    "MolecularDataset",
    "MolToGraph",
    "Pipeline",
    "PrefetchLoader",
    "SmiToMol",
    "StackedBatch",
    "Subset",
    "stack_trees",
    "TargetSpec",
    "TrainState",
    "TransformManager",
    "build_dmpnn",
    "fill_pred_transform_keys",
    "build_masked_atom_pretrainer",
    "build_multicomponent_dmpnn",
    "evaluate",
    "fit",
    "pad_graphs",
    "pad_graphs_dense",
    "predict",
    "random_split",
    "scaffold_split",
    "with_csr_packing",
]

"""Data parallelism for the dense per-molecule layout via GSPMD.

Dense batches lead every leaf with the molecule axis ``[B, ...]`` and every
op in the model is independent per molecule until the loss reduce — so the
whole train step is data-parallel by construction. No shard_map needed:
shard the batch on the mesh's data axis, replicate the state, and XLA's
SPMD partitioner inserts the single gradient ``psum`` automatically.

This complements :class:`notorch_tpu.parallel.spmd.SpmdTrainer` (which
handles the flat layout's edge partitioning); use this one when training
the dense/fused layout on a multi-chip slice.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from notorch_tpu.model.model import Model, TrainState

__all__ = ["DenseDataParallel"]


class DenseDataParallel:
    """Shard dense-layout batches over ``axis``; params stay replicated."""

    def __init__(self, model: Model, mesh: Mesh, axis: str = "data"):
        self.model = model
        self.mesh = mesh
        self.batch_sharding = NamedSharding(mesh, P(axis))
        self.replicated = NamedSharding(mesh, P())

    def shard_batch(self, batch):
        """Device-put every leaf with its leading (molecule) axis split
        across the data axis."""
        return jax.device_put(batch, self.batch_sharding)

    def replicate_state(self, state: TrainState) -> TrainState:
        return jax.device_put(state, self.replicated)

    def init(self, rng, example_batch) -> TrainState:
        state = self.model.init(rng, example_batch)
        return self.replicate_state(state)

    def train_step(self, state: TrainState, batch):
        return self.model.train_step(state, self.shard_batch(batch))

    def eval_step(self, params, batch, extra_vars=None):
        return self.model.eval_step(params, self.shard_batch(batch), extra_vars)

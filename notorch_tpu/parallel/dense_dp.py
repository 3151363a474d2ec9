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
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from notorch_tpu.model.model import EPS, Model, TrainState

__all__ = ["DenseDataParallel", "DenseSpmdTrainer"]


def _mark_shards_local(batch: dict) -> dict:
    """Inside shard_map each device holds ONE chunk of a
    ``pack_graphs_dense(n_shards=k)`` batch — a complete single-shard batch
    with chunk-local molecule ids. Reset the shard marker so the packed
    readouts (which refuse ambiguous multi-shard batches) accept it."""
    from notorch_tpu.data.dense import DenseBatchedGraph

    return {
        k: v.replace(n_shards=1)
        if isinstance(v, DenseBatchedGraph) and v.n_shards != 1
        else v
        for k, v in batch.items()
    }


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


class DenseSpmdTrainer:
    """Explicit-SPMD data parallelism for the dense layout via ``shard_map``.

    Use this instead of :class:`DenseDataParallel` when the model contains
    ``pallas_call`` custom kernels (``layout="dense_fused"``): XLA's GSPMD
    partitioner treats a custom call as opaque and replicates it (gathering
    the full batch onto every chip), whereas under ``shard_map`` each device
    runs the kernel on its local molecule shard and only the gradient
    ``pmean`` crosses the ICI.

    Loss-term means over equal-size molecule shards compose exactly:
    ``pmean`` of per-shard means == the unsharded global mean, so gradients
    equal the single-device step bit-for-bit (tested).
    """

    def __init__(self, model: Model, mesh: Mesh, data_axis: str = "data"):
        self.model = model
        self.mesh = mesh
        self.data_axis = data_axis
        batch_spec = P(data_axis)

        def local_train_step(state: TrainState, batch):
            if state.extra_vars:
                raise ValueError(
                    "DenseSpmdTrainer does not thread mutable collections "
                    "(e.g. BatchNorm batch_stats); use the jnp dense layout "
                    "with DenseDataParallel for those models"
                )
            rng = jax.random.fold_in(state.rng, jax.lax.axis_index(data_axis))
            rng, dropout_rng = jax.random.split(rng)

            def loss_fn(params):
                out = model.network.apply(
                    {"params": params}, _mark_shards_local(batch), training=True,
                    rngs={"dropout": dropout_rng},
                )
                out = model._apply_transforms(out, "targets")
                terms = model._loss_terms(out)
                total = sum(
                    model.train_loss_weights.get(name, EPS) * v
                    for name, v in terms.items()
                )
                return total, terms

            (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            terms = jax.lax.pmean(terms, data_axis)
            updates, opt_state = model.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params,
                opt_state=opt_state,
                step=state.step + 1,
                rng=state.rng,
                extra_vars=state.extra_vars,
            )
            logs = {f"train/{k}": v for k, v in terms.items()}
            logs["train/loss"] = loss
            return new_state, logs

        self._train_step = jax.jit(
            shard_map(
                local_train_step,
                mesh=mesh,
                in_specs=(P(), batch_spec),
                out_specs=(P(), P()),
                check_vma=False,
            ),
            donate_argnums=0,
        )

        def local_eval_step(params, batch):
            out = model.network.apply(
                {"params": params}, _mark_shards_local(batch), training=False
            )
            out = model._apply_transforms(out, "targets")
            terms = model._loss_terms(out)
            terms.update(model._metric_terms(out))
            return jax.lax.pmean(terms, data_axis)

        self._eval_step = jax.jit(
            shard_map(
                local_eval_step,
                mesh=mesh,
                in_specs=(P(), batch_spec),
                out_specs=P(),
                check_vma=False,
            )
        )

    def init(self, rng: jax.Array, example_batch) -> TrainState:
        # init traces the network only (no loss), so the chunk-id collision
        # of an unsplit shards>1 batch is harmless — but the packed readouts'
        # multi-shard guard must be disarmed for the trace
        state = self.model.init(rng, _mark_shards_local(dict(example_batch)))
        return jax.device_put(state, NamedSharding(self.mesh, P()))

    def train_step(self, state: TrainState, batch):
        return self._train_step(state, batch)

    def eval_step(self, params, batch):
        return self._eval_step(params, batch)

"""SPMD training: data-parallel + edge-partitioned steps under shard_map.

Replaces what the reference would get from Lightning DDP/NCCL (it configures
none — SURVEY §2.2) with mesh collectives over ICI: gradients ``psum`` across
the mesh, the edge-partitioned message passing ``psum``s node messages across
the ``graph`` axis inside the forward (see ``ChempropLayer.psum_axis``).

Gradient exactness: with edge sharding, post-message-passing computation
(readout/head/loss) is replicated across the graph axis. The loss is gated to
graph-shard 0, which makes a uniform ``psum`` of gradients over BOTH axes
exactly equal to the unsharded gradients: the ``psum`` in the forward
broadcasts the full cotangent to every shard's local edge path (partial
grads sum to the total), while replicated-path grads are nonzero only on
shard 0 (counted once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from notorch_tpu.model.model import EPS, Model, TrainState

__all__ = ["SpmdTrainer"]


def _squeeze_leading(tree, n: int):
    return jax.tree.map(lambda x: x.reshape(x.shape[n:]), tree)


class SpmdTrainer:
    """Wrap a :class:`Model` with a shard_map-ped train step.

    Batches come from :func:`notorch_tpu.parallel.partition.build_spmd_batch`
    with every leaf shaped ``[n_data, n_edge_shards, ...]``. Params are
    replicated; if ``graph_axis`` is used the model's message-passing blocks
    must be built with ``psum_axis=graph_axis``.
    """

    def __init__(
        self,
        model: Model,
        mesh: Mesh,
        data_axis: str = "data",
        graph_axis: str | None = None,
    ):
        self.model = model
        self.mesh = mesh
        self.data_axis = data_axis
        self.graph_axis = graph_axis
        batch_spec = P(data_axis, graph_axis) if graph_axis else P(data_axis, None)

        def local_train_step(state: TrainState, batch):
            batch = _squeeze_leading(batch, 2)
            rng = jax.random.fold_in(state.rng, jax.lax.axis_index(data_axis))
            rng, dropout_rng = jax.random.split(rng)
            # non-param collections (e.g. BatchNorm batch_stats) are threaded
            # through the sharded step; flax returns (out, vars) only when
            # mutable is non-empty, so collapse the empty case to False
            mutable = list(state.extra_vars.keys()) or False

            def loss_fn(params):
                result = model.network.apply(
                    {"params": params, **state.extra_vars}, dict(batch), training=True,
                    rngs={"dropout": dropout_rng}, mutable=mutable,
                )
                out, new_vars = result if mutable else (result, {})
                out = model._apply_transforms(out, "targets")
                terms = model._loss_terms(out)
                total = sum(
                    model.train_loss_weights.get(name, EPS) * v for name, v in terms.items()
                )
                if graph_axis is not None:
                    # count the replicated tail exactly once (see module doc)
                    gate = (jax.lax.axis_index(graph_axis) == 0).astype(total.dtype)
                    total = total * gate
                    terms = {k: v * gate for k, v in terms.items()}
                return total, (terms, new_vars)

            (loss, (terms, new_vars)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            # mean over data shards, sum over edge shards
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            terms = jax.lax.pmean(terms, data_axis)
            if graph_axis is not None:
                grads = jax.lax.psum(grads, graph_axis)
                loss = jax.lax.psum(loss, graph_axis)
                terms = jax.lax.psum(terms, graph_axis)
            if mutable:
                # cross-replica statistics: each data shard sees a different
                # sub-batch, so running stats are averaged over the data axis
                # (graph shards compute identical stats on the replicated
                # tail — no combine needed there)
                new_vars = jax.lax.pmean(dict(new_vars), data_axis)

            updates, opt_state = model.optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, opt_state=opt_state, step=state.step + 1, rng=rng,
                extra_vars=new_vars if mutable else state.extra_vars,
            )
            logs = {f"train/{k}": v for k, v in terms.items()}
            logs["train/loss"] = loss
            return new_state, logs

        sharded = shard_map(
            local_train_step,
            mesh=mesh,
            in_specs=(P(), batch_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        self._train_step = jax.jit(sharded, donate_argnums=0)

        def multi_step(state, batches):
            # K sharded steps in one dispatch (leading axis = steps); logs
            # step-averaged in-jit. Same latency amortization as
            # Model.train_steps, under the mesh.
            state, logs = jax.lax.scan(sharded, state, batches)
            return state, jax.tree.map(lambda x: x.mean(axis=0), logs)

        self._train_steps = jax.jit(multi_step, donate_argnums=0)

        def local_eval_step(params, batch, extra_vars):
            batch = _squeeze_leading(batch, 2)
            out = model.network.apply(
                {"params": params, **extra_vars}, dict(batch), training=False
            )
            out = model._apply_transforms(out, "targets")
            terms = model._loss_terms(out)
            terms.update(model._metric_terms(out))
            if graph_axis is not None:
                gate = (jax.lax.axis_index(graph_axis) == 0).astype(jnp.float32)
                terms = {k: v * gate for k, v in terms.items()}
                terms = jax.lax.psum(terms, graph_axis)
            return jax.lax.pmean(terms, data_axis)

        self._eval_step = jax.jit(
            shard_map(
                local_eval_step,
                mesh=mesh,
                in_specs=(P(), batch_spec, P()),
                out_specs=P(),
                check_vma=False,
            )
        )

    def init(self, rng: jax.Array, stacked_batch) -> TrainState:
        """Initialize params (replicated). Runs inside shard_map so the
        model's collective axes are bound during the init trace."""
        params_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
        batch_spec = (
            P(self.data_axis, self.graph_axis)
            if self.graph_axis
            else P(self.data_axis, None)
        )

        def local_init(batch):
            batch = _squeeze_leading(batch, 2)
            variables = dict(
                self.model.network.init(
                    {"params": params_rng, "dropout": dropout_rng}, dict(batch), training=True
                )
            )
            params = variables.pop("params")
            return params, variables

        params, extra_vars = jax.jit(
            shard_map(
                local_init,
                mesh=self.mesh,
                in_specs=(batch_spec,),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )(stacked_batch)
        opt_state = self.model.optimizer.init(params)
        state = TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            extra_vars=extra_vars,
        )
        # commit the WHOLE state to the mesh (optimizer.init above ran
        # outside the mesh, so its leaves sit on one device): keeps every
        # leaf's layout consistent for sharded checkpoint restore
        from jax.sharding import NamedSharding

        return jax.device_put(state, NamedSharding(self.mesh, P()))

    def train_step(self, state: TrainState, stacked_batch):
        return self._train_step(state, stacked_batch)

    def train_steps(self, state: TrainState, stacked_batches):
        """K train steps in one dispatch: ``stacked_batches`` adds a leading
        steps axis to every leaf of the usual SPMD batch (stack K same-shape
        batches). Returns (state, step-averaged logs)."""
        return self._train_steps(state, stacked_batches)

    def eval_step(self, params, stacked_batch, extra_vars=None):
        return self._eval_step(params, stacked_batch, extra_vars or {})

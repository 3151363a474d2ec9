"""The generic trainable model: composed network + losses + metrics +
transforms + optimizer, with jit-compiled train/eval steps.

Capability parity: reference ``NotorchModel`` (lightning_models/model.py:25-280)
— the declarative ``modules``/``losses``/``metrics``/``transforms`` recipe and
the ``train/<name>``, ``val/<name>`` logging keys — re-expressed as pure
functions over an explicit :class:`TrainState`, replacing the Lightning loop
with donated-state jitted steps.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from notorch_tpu.model.composed import ComposedNetwork, _gather, make_network

EPS = 1e-6

TARGET_KEY_PREFIX = "targets"


def is_target_key(key: str) -> bool:
    return key.split(".")[0] == TARGET_KEY_PREFIX


def fill_pred_transform_keys(transforms: Mapping | None, pred_key: str):
    """Point pred-side task transforms at ``pred_key`` where unset.

    ``MolecularDataset.build_task_transform_configs`` knows the target
    statistics but not which module emits predictions, so it leaves
    ``preds.key`` as ``None``; model builders call this with their own
    output key so inverse transforms (denormalization, MVE, Dirichlet...)
    are applied by ``predict_step`` without any manual wiring."""
    if not transforms:
        return transforms
    out = {}
    for name, cfg in transforms.items():
        cfg = dict(cfg)
        preds = cfg.get("preds")
        if preds and preds.get("module") is not None and preds.get("key") is None:
            cfg["preds"] = {**preds, "key": pred_key}
        out[name] = cfg
    return out


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    # non-parameter variable collections (e.g. BatchNorm batch_stats),
    # threaded through train steps functionally
    extra_vars: Any = struct.field(default_factory=dict)


class Model:
    """Compose, initialize, and step a declarative model.

    Parameters mirror the reference's ``NotorchModel.__init__``:

    - ``modules``: ``{name: {"module", "in_keys", "out_keys"}}``
    - ``losses``/``metrics``: ``{name: {"fn", "in_keys", "weight"}}`` where
      ``fn`` is a pure maskable callable from :mod:`notorch_tpu.tasks`
    - ``transforms``: ``{name: {"preds": {"module", "key"}, "targets": ...}}``
    - ``train_loss_weights``/``val_loss_weights``: per-term weights
    - ``optimizer``: any optax transformation (default Adam 1e-4, matching
      model.py:153)
    """

    def __init__(
        self,
        modules: Mapping[str, Mapping],
        losses: Mapping[str, Mapping],
        metrics: Mapping[str, Mapping] | None = None,
        transforms: Mapping[str, Mapping] | None = None,
        train_loss_weights: Mapping[str, float] | None = None,
        val_loss_weights: Mapping[str, float] | None = None,
        optimizer: optax.GradientTransformation | None = None,
    ):
        self.network: ComposedNetwork = make_network(modules)
        self.losses = dict(losses)
        self.metrics = dict(metrics or {})
        self.transforms = dict(transforms or {})
        self.train_loss_weights = dict(
            train_loss_weights
            if train_loss_weights is not None
            else {name: cfg.get("weight", 1.0) for name, cfg in self.losses.items()}
        )
        self.val_loss_weights = dict(
            val_loss_weights if val_loss_weights is not None else self.train_loss_weights
        )
        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-4)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._train_steps = jax.jit(self._train_steps_impl, donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._predict_step = jax.jit(self._predict_step_impl)

    # -- initialization -----------------------------------------------------
    def init(self, rng: jax.Array, example_batch: Mapping[str, Any]) -> TrainState:
        from notorch_tpu.data.batching import StackedBatch

        if isinstance(example_batch, StackedBatch):  # PrefetchLoader(stack=K) item
            example_batch = jax.tree.map(lambda x: x[0], example_batch.tree)
        params_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
        variables = dict(
            self.network.init(
                {"params": params_rng, "dropout": dropout_rng}, dict(example_batch), training=True
            )
        )
        params = variables.pop("params")
        opt_state = self.optimizer.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
            extra_vars=variables,
        )

    # -- shared pieces ------------------------------------------------------
    def _apply_transforms(self, batch: dict, mode: str) -> dict:
        """Apply ``targets`` or ``preds`` transforms in place-by-key.
        Missing keys are tolerated (reference ``partial_tolerant=True``)."""
        batch = dict(batch)
        for cfg in self.transforms.values():
            sub = cfg.get(mode)
            if not sub or sub.get("module") is None or sub.get("key") is None:
                continue
            key = sub["key"]
            if key in batch:
                batch[key] = sub["module"](batch[key])
        return batch

    def _loss_terms(self, batch: dict) -> dict[str, jnp.ndarray]:
        terms = {}
        for name, cfg in self.losses.items():
            args, kwargs = _gather(batch, cfg["in_keys"])
            terms[name] = cfg["fn"](*args, **kwargs)
        return terms

    def _metric_terms(self, batch: dict) -> dict[str, jnp.ndarray]:
        terms = {}
        for name, cfg in self.metrics.items():
            args, kwargs = _gather(batch, cfg["in_keys"])
            terms[name] = cfg["fn"](*args, **kwargs)
        return terms

    def _term_counts(self, batch: dict) -> dict[str, jnp.ndarray]:
        """Per-term NORMALIZER totals — the correct batch weights for
        averaging per-batch masked means into the global masked mean, so a
        ragged final batch does not skew ``evaluate()``. The weight must be
        exactly the denominator ``masked_reduce`` used: the mask sum, times
        the sample weights when the term wires them (``sum(w * m)``) —
        otherwise the cross-batch recombination of per-batch weighted means
        would depend on how samples were batched."""
        counts = {}
        for name, cfg in {**self.losses, **self.metrics}.items():
            ks = cfg["in_keys"]
            n = None
            if isinstance(ks, Mapping):
                mask_key = ks.get("mask")
                sw_key = ks.get("sample_weights")
                mask = (
                    batch[mask_key].astype(jnp.float32)
                    if mask_key is not None and mask_key in batch
                    else None
                )
                sw = (
                    batch[sw_key].astype(jnp.float32)
                    if sw_key is not None and sw_key in batch
                    else None
                )
                if sw is not None:
                    if mask is not None:
                        swb = sw.reshape(sw.shape + (1,) * (mask.ndim - sw.ndim))
                        n = (mask * swb).sum()
                    elif ks.get("targets") in batch:
                        per_sample = np.prod(batch[ks["targets"]].shape[1:])
                        n = sw.sum() * jnp.float32(per_sample)
                elif mask is not None:
                    n = mask.sum()
                elif ks.get("targets") in batch:
                    n = jnp.float32(np.prod(batch[ks["targets"]].shape))
            counts[name] = n if n is not None else jnp.float32(1.0)
        return counts

    # -- steps --------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, batch: Mapping[str, Any]):
        rng, dropout_rng = jax.random.split(state.rng)
        # NOTE: flax returns (out, vars) even for mutable=[], so collapse the
        # empty case to False
        mutable = list(state.extra_vars.keys()) or False

        def loss_fn(params):
            result = self.network.apply(
                {"params": params, **state.extra_vars},
                dict(batch),
                training=True,
                rngs={"dropout": dropout_rng},
                mutable=mutable,
            )
            out, new_vars = result if mutable else (result, {})
            out = self._apply_transforms(out, "targets")
            terms = self._loss_terms(out)
            total = sum(
                self.train_loss_weights.get(name, EPS) * v for name, v in terms.items()
            )
            return total, (terms, new_vars)

        (loss, (terms, new_vars)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
            extra_vars=dict(new_vars) if mutable else state.extra_vars,
        )
        logs = {f"train/{k}": v for k, v in terms.items()}
        logs["train/loss"] = loss
        return new_state, logs

    def _train_steps_impl(self, state: TrainState, batches):
        """K optimizer steps in ONE device dispatch: ``lax.scan`` of the
        train step over a stacked batch pytree (leading axis = steps).

        This is the TPU-idiomatic answer to host/dispatch overhead (and, on
        tunneled devices, round-trip latency): the whole scan compiles to a
        single XLA program, so K steps cost one launch + K compute bodies
        instead of K launches. Logs are averaged over the K steps in-jit so
        only scalars come back to host.
        """
        state, logs = jax.lax.scan(self._train_step_impl, state, batches)
        return state, jax.tree.map(lambda x: x.mean(axis=0), logs)

    def _eval_step_impl(self, params, batch: Mapping[str, Any], extra_vars=None):
        out = self.network.apply(
            {"params": params, **(extra_vars or {})}, dict(batch), training=False
        )
        out = self._apply_transforms(out, "targets")
        terms = self._loss_terms(out)
        metric_terms = self._metric_terms(out)
        val_loss = sum(self.val_loss_weights.get(name, EPS) * v for name, v in terms.items())
        val_loss = val_loss + sum(
            self.val_loss_weights.get(name, EPS) * v for name, v in metric_terms.items()
        )
        logs = {f"val/{k}": v for k, v in {**terms, **metric_terms}.items()}
        logs["val/loss"] = val_loss
        counts = self._term_counts(out)
        logs.update({f"_count/val/{k}": v for k, v in counts.items()})
        if self.losses:
            logs["_count/val/loss"] = counts[next(iter(self.losses))]
        return logs, out

    def _predict_step_impl(self, params, batch: Mapping[str, Any], extra_vars=None):
        out = self.network.apply(
            {"params": params, **(extra_vars or {})}, dict(batch), training=False
        )
        return self._apply_transforms(out, "preds")

    # -- public API ---------------------------------------------------------
    def train_step(self, state: TrainState, batch) -> tuple[TrainState, dict]:
        return self._train_step(state, batch)

    def train_steps(self, state: TrainState, stacked_batches) -> tuple[TrainState, dict]:
        """Run K train steps in one dispatch. ``stacked_batches`` is a batch
        pytree with an extra leading steps axis on every array leaf (stack K
        same-shape batches with ``jax.tree.map(lambda *xs: jnp.stack(xs),
        *batches)``). Returns the advanced state and step-averaged logs."""
        return self._train_steps(state, stacked_batches)

    def eval_step(self, params, batch, extra_vars=None) -> tuple[dict, dict]:
        return self._eval_step(params, batch, extra_vars)

    def predict_step(self, params, batch, extra_vars=None) -> dict:
        return self._predict_step(params, batch, extra_vars)

    def apply(self, params, batch, training: bool = False, rngs=None, extra_vars=None) -> dict:
        return self.network.apply(
            {"params": params, **(extra_vars or {})}, dict(batch), training=training, rngs=rngs
        )

    def summary(self, params=None) -> str:
        """Readable composition summary (the reference's rich ``__repr__``
        story, model.py/graph.py pretty-printers)."""
        lines = ["Model("]
        for name, in_keys, out_keys in self.network.wiring:
            mod = self.network.modules_[name]
            n_params = ""
            if params is not None and name in params:
                count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params[name]))
                n_params = f"  [{count:,} params]"
            ik = list(in_keys.values()) if isinstance(in_keys, dict) else list(in_keys)
            lines.append(
                f"  ({name}): {type(mod).__name__} {ik} -> "
                f"{[f'{name}.{k}' for k in out_keys]}{n_params}"
            )
        for name, cfg in self.losses.items():
            w = self.train_loss_weights.get(name, 1.0)
            lines.append(f"  (loss {name}): {type(cfg['fn']).__name__} x{w}")
        for name, cfg in self.metrics.items():
            lines.append(f"  (metric {name}): {type(cfg['fn']).__name__}")
        if params is not None:
            total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
            lines.append(f"  total params: {total:,}")
        lines.append(")")
        return "\n".join(lines)

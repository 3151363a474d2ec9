"""The training loop: fit / evaluate / predict.

Replaces the reference's Lightning ``Trainer`` (``notorch/cli/train.py:30-37``,
``lightning_models/model.py:224-280``) with an explicit loop around the
model's jitted steps. Logging keys match the reference (``train/<name>``,
``val/<name>``, ``train/loss``, ``val/loss``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Mapping

import numpy as np

from notorch_tpu.data.batching import StackedBatch
from notorch_tpu.model.model import Model, TrainState


@dataclass
class FitResult:
    state: TrainState
    history: list[dict] = field(default_factory=list)
    stopped_early: bool = False


def _shape_signature(batch) -> tuple:
    """Hashable (treedef, leaf shapes/dtypes) — two batches with equal
    signatures can be stacked and scanned in one compiled program."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(batch)
    return treedef, tuple(
        (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x).__name__)))
        for x in leaves
    )


def _stack_batches(batches: list):
    from notorch_tpu.data.batching import stack_trees

    return stack_trees(batches)


def fit(
    model: Model,
    state: TrainState,
    train_loader,
    val_loader=None,
    epochs: int = 1,
    log_every: int = 0,
    log_fn: Callable[[dict], None] | None = None,
    host_metrics: Mapping[str, Mapping] | None = None,
    checkpointer=None,
    resume: bool = False,
    checkpoint_every: int = 0,
    steps_per_dispatch: int = 1,
    early_stopping: Mapping | None = None,
) -> FitResult:
    """Run the jitted train step over the loader for ``epochs`` epochs.

    ``host_metrics``: ``{name: {"fn", "in_keys"}}`` computed host-side from
    accumulated eval outputs (AUROC/AUPRC/F1 — reference metrics.py:76-152).

    Preemption safety (SURVEY §5 failure recovery — the reference delegates
    this to Lightning, ``notorch/cli/train.py:30``): ``checkpoint_every=K``
    additionally checkpoints every K batches WITH the loop cursor
    (epoch, batches trained) as a sidecar; ``resume=True`` restores the
    latest checkpoint — params, optimizer state, step count, AND the RNG
    key (all live in :class:`TrainState`) — then re-derives the interrupted
    epoch's batch order (the loop epoch-keys the loader via ``set_epoch``,
    making each epoch's order a pure function of (seed, epoch)) and
    fast-forwards past the already-trained batches. A killed-and-resumed
    run therefore produces the SAME trajectory as an uninterrupted one
    (tests/test_checkpoint.py::test_preemption_resume_trajectory_equality),
    provided the loader/steps_per_dispatch configuration is unchanged.
    Checkpoints from older versions (no sidecar) restore state only and
    restart at epoch 0.

    ``steps_per_dispatch > 1`` groups consecutive same-shape batches (the
    bucketed loader emits only a few shapes) and runs each group as ONE
    device dispatch via :meth:`Model.train_steps` (``lax.scan`` over the
    stacked batches). Identical math to step-by-step training; amortizes
    launch/tunnel latency, which dominates small-molecule steps on TPU.

    ``early_stopping={"monitor": "val/rmse", "patience": 5, "mode": "min",
    "min_delta": 0.0}`` stops training when the monitored epoch metric has
    not improved (by > min_delta) for ``patience`` consecutive epochs —
    the reference gets this from Lightning's ``EarlyStopping`` callback
    injected via Hydra (``notorch/cli/utils/instantiate.py:9-43``). Pair
    with ``Checkpointer(best_by=...)`` to keep / restore the BEST epoch.
    ``model`` may also be an SPMD trainer (``SpmdTrainer`` /
    ``DenseSpmdTrainer``): they expose the same ``train_step`` contract and
    the checkpointer saves/restores their sharded states natively.
    """
    history = []
    start_epoch = 0
    es_monitor = es_best = None
    es_wait = 0
    if early_stopping is not None:
        es_monitor = early_stopping["monitor"]
        es_patience = int(early_stopping.get("patience", 5))
        es_mode = early_stopping.get("mode", "min")
        es_delta = float(early_stopping.get("min_delta", 0.0))
        if es_mode not in ("min", "max"):
            raise ValueError(f"early_stopping mode must be min|max, got {es_mode!r}")
    skip_batches = 0
    if resume and checkpointer is not None and checkpointer.latest_step() is not None:
        state, extra = checkpointer.restore(state, with_extra=True)
        if extra:
            start_epoch = int(extra.get("epoch", 0))
            skip_batches = int(extra.get("batches_done", 0))
    for epoch in range(start_epoch, epochs):
        set_epoch = getattr(train_loader, "set_epoch", None)
        if callable(set_epoch):
            set_epoch(epoch)
        t0 = time.perf_counter()
        train_logs: dict[str, float] = {}
        n_batches = 0
        since_save = 0
        # batches of this epoch already trained by the PREEMPTED run (they
        # are skipped below, but count toward the epoch cursor)
        done_offset = skip_batches if epoch == start_epoch else 0
        to_skip = done_offset
        pending: list = []
        pending_sig = None

        def run_group(state, group):
            # Undersized (trailing / bucket-boundary) groups run step-by-step
            # to reuse the single-step compile instead of compiling a scan
            # per distinct group length.
            if len(group) < steps_per_dispatch:
                sums: dict = {}
                for b in group:
                    state, logs = model.train_step(state, b)
                    for k, v in logs.items():
                        sums[k] = sums.get(k, 0.0) + v
                return state, {k: v / len(group) for k, v in sums.items()}
            return model.train_steps(state, _stack_batches(group))

        def handle_logs(logs, weight: int):
            # Accumulate log values as DEVICE scalars — float() would force a
            # device round-trip every step (a ~30-50 ms latency floor on
            # tunneled TPUs dwarfs the 1-3 ms step compute). Materialize only
            # at log_every boundaries and epoch end, so dispatches pipeline.
            nonlocal n_batches, since_save
            n_batches += weight
            if log_every and (n_batches % log_every) < weight and log_fn:
                log_fn(
                    {"epoch": epoch, "step": int(state.step)}
                    | {k: float(v) for k, v in logs.items()}
                )
            for k, v in logs.items():
                train_logs[k] = train_logs.get(k, 0.0) + v * weight
            since_save += weight
            if checkpointer is not None and checkpoint_every and since_save >= checkpoint_every:
                # the cursor counts ALL batches of this epoch trained so far
                # (including any trained before a previous preemption)
                checkpointer.save(
                    state,
                    step=int(state.step),
                    extra={"epoch": epoch, "batches_done": done_offset + n_batches},
                )
                since_save = 0

        for batch in train_loader:
            if to_skip > 0:
                # fast-forward past batches the preempted run already trained
                # (same epoch-keyed order; the samples are never re-trained)
                w = batch.n if isinstance(batch, StackedBatch) else 1
                if w > to_skip:
                    raise RuntimeError(
                        f"resume cursor ({done_offset} batches) does not align "
                        f"with the loader's dispatch groups (next group has "
                        f"{w}); resume with the same loader configuration and "
                        "steps_per_dispatch as the interrupted run"
                    )
                to_skip -= w
                continue
            if isinstance(batch, StackedBatch):
                # pre-stacked, pre-transferred group from PrefetchLoader(stack=K)
                if pending:
                    n = len(pending)
                    state, logs = run_group(state, pending)
                    pending = []
                    handle_logs(logs, n)
                state, logs = model.train_steps(state, batch.tree)
                handle_logs(logs, batch.n)
                continue
            if steps_per_dispatch <= 1:
                state, logs = model.train_step(state, batch)
                handle_logs(logs, 1)
                continue
            sig = _shape_signature(batch)
            if pending and sig != pending_sig:
                n = len(pending)
                state, logs = run_group(state, pending)
                pending = []
                handle_logs(logs, n)
            pending.append(batch)
            pending_sig = sig
            if len(pending) == steps_per_dispatch:
                state, logs = run_group(state, pending)
                pending = []
                handle_logs(logs, steps_per_dispatch)
        if pending:
            n = len(pending)
            state, logs = run_group(state, pending)
            handle_logs(logs, n)
        if to_skip > 0:
            # the cursor outran the epoch: the dataset shrank or the batch
            # size changed since the checkpoint — silently "completing" the
            # epoch would drop training the user expects to happen
            raise RuntimeError(
                f"resume cursor ({done_offset} batches) exceeds this epoch's "
                f"batch count by {to_skip}; resume with the same dataset, "
                "batch_size, and steps_per_dispatch as the interrupted run"
            )
        train_logs = {k: float(v) / max(n_batches, 1) for k, v in train_logs.items()}

        record = {"epoch": epoch, "time": time.perf_counter() - t0, **train_logs}
        if val_loader is not None:
            record.update(
                evaluate(model, state.params, val_loader, host_metrics, state.extra_vars)
            )
        history.append(record)
        if log_fn:
            log_fn(record)
        if checkpointer is not None:
            checkpointer.save(
                state,
                step=int(state.step),
                metrics=record,
                extra={"epoch": epoch + 1, "batches_done": 0},
            )
        if es_monitor is not None:
            if es_monitor not in record:
                raise KeyError(
                    f"early_stopping monitor {es_monitor!r} not in the epoch "
                    f"record; available: {sorted(record)} (a val/ metric "
                    "requires val_loader)"
                )
            value = float(record[es_monitor])
            improved = es_best is None or (
                value < es_best - es_delta
                if es_mode == "min"
                else value > es_best + es_delta
            )
            if improved:
                es_best, es_wait = value, 0
            else:
                es_wait += 1
                if es_wait >= es_patience:
                    return FitResult(state=state, history=history, stopped_early=True)
    return FitResult(state=state, history=history)


def evaluate(
    model: Model,
    params,
    loader,
    host_metrics: Mapping[str, Mapping] | None = None,
    extra_vars=None,
) -> dict[str, float]:
    """Count-weighted average of device metrics over batches (each batch's
    masked mean is weighted by its mask count, so a ragged final batch does
    not skew the average); accumulate outputs for host metrics over the whole
    pass (proper AUROC, unlike per-batch averaging)."""
    sums: dict = {}
    weights: dict = {}
    n = 0
    accum: dict[str, list[np.ndarray]] = {}
    needed_keys = set()
    for cfg in (host_metrics or {}).values():
        ks = cfg["in_keys"]
        needed_keys.update(ks.values() if isinstance(ks, Mapping) else ks)

    for batch in loader:
        if isinstance(batch, StackedBatch):
            raise TypeError(
                "evaluate() expects single batches; build the eval loader "
                "without PrefetchLoader(stack=K)"
            )
        logs, out = model.eval_step(params, batch, extra_vars)
        n += 1
        for k, v in logs.items():
            if k.startswith("_count/"):
                continue
            # device-side accumulation: float() here would sync every batch
            w = logs.get(f"_count/{k}", 1.0)
            sums[k] = sums.get(k, 0.0) + v * w
            weights[k] = weights.get(k, 0.0) + w
        for key in needed_keys:
            # hold device arrays; fetching here would sync every batch
            accum.setdefault(key, []).append(out[key])

    import jax

    accum = {k: [np.asarray(x) for x in jax.device_get(v)] for k, v in accum.items()}
    results = {
        k: float(v) / max(float(weights.get(k, n)), 1e-9) for k, v in sums.items()
    }
    for name, cfg in (host_metrics or {}).items():
        ks = cfg["in_keys"]
        if isinstance(ks, Mapping):
            kwargs = {kw: np.concatenate(accum[key]) for kw, key in ks.items()}
            results[f"val/{name}"] = float(cfg["fn"](**kwargs))
        else:
            args = [np.concatenate(accum[key]) for key in ks]
            results[f"val/{name}"] = float(cfg["fn"](*args))
    return results


def predict(
    model: Model, params, loader, keys: list[str] | None = None, extra_vars=None
) -> dict[str, np.ndarray]:
    """Inference pass applying the ``preds`` transforms
    (reference ``predict_step``, model.py:267-271)."""
    import jax

    accum: dict[str, list] = {}
    for batch in loader:
        out = model.predict_step(params, batch, extra_vars)
        for k, v in out.items():
            if keys is not None and k not in keys:
                continue
            if hasattr(v, "shape"):
                accum.setdefault(k, []).append(v)  # fetch deferred (no per-batch sync)
    accum = jax.device_get(accum)
    return {k: np.concatenate([np.asarray(x) for x in v]) for k, v in accum.items()}

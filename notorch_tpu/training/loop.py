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

from notorch_tpu.model.model import Model, TrainState


@dataclass
class FitResult:
    state: TrainState
    history: list[dict] = field(default_factory=list)


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
) -> FitResult:
    """Run the jitted train step over the loader for ``epochs`` epochs.

    ``host_metrics``: ``{name: {"fn", "in_keys"}}`` computed host-side from
    accumulated eval outputs (AUROC/AUPRC/F1 — reference metrics.py:76-152).
    ``resume=True`` restores the latest checkpoint from ``checkpointer``
    before training (preemption-safe restart; SURVEY §5 failure recovery).
    """
    history = []
    if resume and checkpointer is not None and checkpointer.latest_step() is not None:
        state = checkpointer.restore(state)
    for epoch in range(epochs):
        t0 = time.perf_counter()
        train_logs: dict[str, float] = {}
        n_batches = 0
        for batch in train_loader:
            state, logs = model.train_step(state, batch)
            n_batches += 1
            if log_every and n_batches % log_every == 0:
                logs = {k: float(v) for k, v in logs.items()}
                if log_fn:
                    log_fn({"epoch": epoch, "step": int(state.step), **logs})
            for k, v in logs.items():
                train_logs[k] = train_logs.get(k, 0.0) + float(v)
        train_logs = {k: v / max(n_batches, 1) for k, v in train_logs.items()}

        record = {"epoch": epoch, "time": time.perf_counter() - t0, **train_logs}
        if val_loader is not None:
            record.update(
                evaluate(model, state.params, val_loader, host_metrics, state.extra_vars)
            )
        history.append(record)
        if log_fn:
            log_fn(record)
        if checkpointer is not None:
            checkpointer.save(state, step=int(state.step), metrics=record)
    return FitResult(state=state, history=history)


def evaluate(
    model: Model,
    params,
    loader,
    host_metrics: Mapping[str, Mapping] | None = None,
    extra_vars=None,
) -> dict[str, float]:
    """Average device metrics over batches; accumulate outputs for host
    metrics over the whole pass (proper AUROC, unlike per-batch averaging)."""
    sums: dict[str, float] = {}
    n = 0
    accum: dict[str, list[np.ndarray]] = {}
    needed_keys = set()
    for cfg in (host_metrics or {}).values():
        ks = cfg["in_keys"]
        needed_keys.update(ks.values() if isinstance(ks, Mapping) else ks)

    for batch in loader:
        logs, out = model.eval_step(params, batch, extra_vars)
        n += 1
        for k, v in logs.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        for key in needed_keys:
            accum.setdefault(key, []).append(np.asarray(out[key]))

    results = {k: v / max(n, 1) for k, v in sums.items()}
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
    accum: dict[str, list[np.ndarray]] = {}
    for batch in loader:
        out = model.predict_step(params, batch, extra_vars)
        for k, v in out.items():
            if keys is not None and k not in keys:
                continue
            if hasattr(v, "shape"):
                accum.setdefault(k, []).append(np.asarray(v))
    return {k: np.concatenate(v) for k, v in accum.items()}

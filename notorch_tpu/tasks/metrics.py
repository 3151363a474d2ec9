"""Evaluation metrics: device-side masked metrics (jnp) and host-side ranking
metrics (numpy AUROC/AUPRC/F1 replacing torchmetrics).

Capability parity: reference ``notorch/nn/metrics.py`` — MAE, RMSE, bounded
variants, R2, AUROC, AUPRC, F1, Accuracy, all honoring the ``mask`` /
``ignore_index=-1`` semantics (metrics.py:85-101).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from notorch_tpu.tasks.losses import _apply_bounds, masked_reduce

__all__ = [
    "MAE",
    "RMSE",
    "BoundedMAE",
    "BoundedRMSE",
    "R2",
    "Accuracy",
    "auroc",
    "auprc",
    "f1_score",
    "AUROC",
    "AUPRC",
    "F1",
]


# -- device-side (jnp, maskable, jittable) -----------------------------------


@dataclass(frozen=True)
class MAE:
    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        return masked_reduce(jnp.abs(preds - targets), mask, sample_weights)


@dataclass(frozen=True)
class RMSE:
    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        return jnp.sqrt(masked_reduce((preds - targets) ** 2, mask, sample_weights))


@dataclass(frozen=True)
class BoundedMAE:
    def __call__(self, preds, targets, *, lt_mask, gt_mask, mask=None, sample_weights=None, **kw):
        preds = _apply_bounds(preds, targets, lt_mask, gt_mask)
        return masked_reduce(jnp.abs(preds - targets), mask, sample_weights)


@dataclass(frozen=True)
class BoundedRMSE:
    def __call__(self, preds, targets, *, lt_mask, gt_mask, mask=None, sample_weights=None, **kw):
        preds = _apply_bounds(preds, targets, lt_mask, gt_mask)
        return jnp.sqrt(masked_reduce((preds - targets) ** 2, mask, sample_weights))


@dataclass(frozen=True)
class R2:
    """Coefficient of determination per target, averaged (reference
    metrics.py:49-63)."""

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        if mask is None:
            mask = jnp.ones_like(targets, dtype=bool)
        m = mask.astype(preds.dtype)
        if sample_weights is None:
            w = m
        else:
            w = m * sample_weights[:, None]
        wsum = jnp.maximum(w.sum(0), 1e-12)
        target_mean = (w * targets).sum(0) / wsum
        rss = (w * (preds - targets) ** 2).sum(0)
        tss = (w * (targets - target_mean) ** 2).sum(0)
        return (1 - rss / jnp.maximum(tss, 1e-12)).mean()


@dataclass(frozen=True)
class Accuracy:
    task: str = "binary"
    threshold: float = 0.5

    def __call__(self, preds, targets, *, mask=None, sample_weights=None, **kw):
        if self.task == "binary":
            hard = (preds > self.threshold).astype(preds.dtype)
        else:
            hard = jnp.argmax(preds, axis=-1).astype(preds.dtype)
        return masked_reduce((hard == targets).astype(preds.dtype), mask, sample_weights)


# -- host-side ranking metrics (numpy) ---------------------------------------


def _as_masked_columns(preds, targets, mask):
    preds = np.asarray(preds, dtype=np.float64)
    targets = np.asarray(targets)
    if preds.ndim == 1:
        preds, targets = preds[:, None], targets[:, None]
        mask = None if mask is None else np.asarray(mask)[:, None]
    if mask is None:
        mask = ~np.isnan(np.asarray(targets, dtype=np.float64))
    return preds, targets, np.asarray(mask, dtype=bool)


def _binary_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    # Mann-Whitney U with tie correction via average ranks
    all_scores = np.concatenate([pos, neg])
    order = np.argsort(all_scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(all_scores) + 1)
    # average ranks for ties
    sorted_scores = all_scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            avg = ranks[order[i : j + 1]].mean()
            ranks[order[i : j + 1]] = avg
        i = j + 1
    r_pos = ranks[: len(pos)].sum()
    n_p, n_n = len(pos), len(neg)
    return float((r_pos - n_p * (n_p + 1) / 2) / (n_p * n_n))


def _binary_auprc(scores: np.ndarray, labels: np.ndarray) -> float:
    if labels.sum() == 0:
        return float("nan")
    order = np.argsort(-scores, kind="mergesort")
    labels = labels[order]
    tp = np.cumsum(labels)
    precision = tp / np.arange(1, len(labels) + 1)
    recall = tp / labels.sum()
    # average precision: sum precision at each positive hit
    return float((precision * labels).sum() / labels.sum())


def auroc(preds, targets, *, mask=None, task: str = "binary") -> float:
    """Masked multilabel/binary AUROC, macro-averaged over targets."""
    preds, targets, mask = _as_masked_columns(preds, targets, mask)
    vals = []
    for t in range(preds.shape[1]):
        m = mask[:, t]
        if m.sum() == 0:
            continue
        v = _binary_auroc(preds[m, t], np.asarray(targets[m, t], dtype=np.int64))
        if not np.isnan(v):
            vals.append(v)
    return float(np.mean(vals)) if vals else float("nan")


def auprc(preds, targets, *, mask=None, task: str = "binary") -> float:
    preds, targets, mask = _as_masked_columns(preds, targets, mask)
    vals = []
    for t in range(preds.shape[1]):
        m = mask[:, t]
        if m.sum() == 0:
            continue
        v = _binary_auprc(preds[m, t], np.asarray(targets[m, t], dtype=np.int64))
        if not np.isnan(v):
            vals.append(v)
    return float(np.mean(vals)) if vals else float("nan")


def f1_score(preds, targets, *, mask=None, threshold: float = 0.5, task: str = "binary") -> float:
    preds, targets, mask = _as_masked_columns(preds, targets, mask)
    vals = []
    for t in range(preds.shape[1]):
        m = mask[:, t]
        if m.sum() == 0:
            continue
        hard = preds[m, t] > threshold
        y = np.asarray(targets[m, t], dtype=np.int64)
        tp = float((hard & (y == 1)).sum())
        fp = float((hard & (y == 0)).sum())
        fn = float((~hard & (y == 1)).sum())
        denom = 2 * tp + fp + fn
        vals.append(2 * tp / denom if denom > 0 else 0.0)
    return float(np.mean(vals)) if vals else float("nan")


@dataclass(frozen=True)
class AUROC:
    task: str = "binary"

    def __call__(self, preds, targets, *, mask=None, **kw):
        return auroc(preds, targets, mask=mask, task=self.task)


@dataclass(frozen=True)
class AUPRC:
    task: str = "binary"

    def __call__(self, preds, targets, *, mask=None, **kw):
        return auprc(preds, targets, mask=mask, task=self.task)


@dataclass(frozen=True)
class F1:
    task: str = "binary"
    threshold: float = 0.5

    def __call__(self, preds, targets, *, mask=None, **kw):
        return f1_score(preds, targets, mask=mask, threshold=self.threshold, task=self.task)

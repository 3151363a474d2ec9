"""Task-side output/target transforms.

Capability parity: reference ``notorch/nn/transforms.py`` — affine
Normalize/InverseNormalize pairs computed from *training* target statistics,
MVE/Evidential denormalizers, Dirichlet α → (probs, uncertainty), plus the
``build(task_type, values)`` factory that wires dataset statistics into the
model graph (reference transforms.py:71-98).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

TaskType = Literal["regression", "classification", "multiclass", "mve", "evidential", "dirichlet"]

TASK_TYPES = ("regression", "classification", "multiclass", "mve", "evidential", "dirichlet")


@dataclass(frozen=True)
class Normalize:
    loc: tuple
    scale: tuple

    def __call__(self, x):
        return (x - jnp.asarray(self.loc)) / jnp.asarray(self.scale)


@dataclass(frozen=True)
class InverseNormalize:
    loc: tuple
    scale: tuple

    def __call__(self, x):
        return x * jnp.asarray(self.scale) + jnp.asarray(self.loc)


@dataclass(frozen=True)
class MVE:
    """Denormalize (mean, var) heads: mean affine, var by scale^2."""

    loc: tuple
    scale: tuple

    def __call__(self, x):
        loc, scale = jnp.asarray(self.loc), jnp.asarray(self.scale)
        mean = x[..., 0] * scale + loc
        var = x[..., 1] * scale**2
        return jnp.stack([mean, var], axis=-1)


@dataclass(frozen=True)
class Evidential:
    """Activate + denormalize (mean, var, alpha, beta) evidential heads."""

    loc: tuple
    scale: tuple

    def __call__(self, x):
        loc, scale = jnp.asarray(self.loc), jnp.asarray(self.scale)
        mean, var, alpha, beta = (x[..., i] for i in range(4))
        var = jax.nn.softplus(var)
        alpha = jax.nn.softplus(alpha) + 1
        beta = jax.nn.softplus(beta)
        mean = mean * scale + loc
        var = var * scale**2
        return jnp.stack([mean, var, alpha, beta], axis=-1)


@dataclass(frozen=True)
class Dirichlet:
    """α → per-class probabilities plus the k/S uncertainty channel."""

    def __call__(self, x):
        k = x.shape[-1]
        alpha = jax.nn.softplus(x) + 1
        S = alpha.sum(-1, keepdims=True)
        return jnp.concatenate([alpha / S, k / S], axis=-1)


@dataclass(frozen=True)
class Sigmoid:
    def __call__(self, x):
        return jax.nn.sigmoid(x)


@dataclass(frozen=True)
class Softmax:
    def __call__(self, x):
        return jax.nn.softmax(x, axis=-1)


def build(task_type: TaskType | None, values: np.ndarray) -> dict[str, Callable | None]:
    """Compute per-target transforms from training-target statistics.

    ``values``: [n, t] training targets (may contain NaN for missing entries —
    statistics are computed with nan-aware reductions)."""
    if task_type is None:
        return {"preds": None, "targets": None}

    if task_type in ("regression", "mve", "evidential"):
        values = np.asarray(values, dtype=np.float64)
        mean = tuple(np.nanmean(values, axis=0).astype(np.float32).tolist())
        std_arr = np.nanstd(values, axis=0, ddof=1)
        std = tuple(np.where(std_arr > 0, std_arr, 1.0).astype(np.float32).tolist())
        preds = {"regression": InverseNormalize, "mve": MVE, "evidential": Evidential}[task_type](
            mean, std
        )
        return {"preds": preds, "targets": Normalize(mean, std)}

    if task_type == "classification":
        return {"preds": Sigmoid(), "targets": None}
    if task_type == "multiclass":
        return {"preds": Softmax(), "targets": None}
    if task_type == "dirichlet":
        return {"preds": Dirichlet(), "targets": None}

    raise ValueError(f"invalid task type {task_type!r}; expected one of {TASK_TYPES}")


_TRANSFORM_CLASSES = {
    cls.__name__: cls
    for cls in (Normalize, InverseNormalize, MVE, Evidential, Dirichlet, Sigmoid, Softmax)
}


def serialize(transform) -> dict | None:
    """JSON-able record of a task transform (for predict-from-checkpoint)."""
    import dataclasses

    if transform is None:
        return None
    name = type(transform).__name__
    if name not in _TRANSFORM_CLASSES:
        raise TypeError(f"cannot serialize task transform {name!r}")
    rec = {"kind": name}
    for f in dataclasses.fields(transform):
        rec[f.name] = list(getattr(transform, f.name))
    return rec


def deserialize(rec: dict | None):
    """Inverse of :func:`serialize`."""
    if rec is None:
        return None
    rec = dict(rec)
    cls = _TRANSFORM_CLASSES[rec.pop("kind")]
    return cls(**{k: tuple(v) for k, v in rec.items()})

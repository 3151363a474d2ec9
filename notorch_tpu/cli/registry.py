"""Name -> class registry for config-driven model composition.

The reference's UX is "models as config files" via Hydra ``_target_`` paths
(reference cli/train.py:17-37). Here the registry plays that role: every
module, loss, metric, transform, aggregation, router, and optimizer the
framework ships is constructible by name from YAML/JSON.

User extension (parity with Hydra ``_target_`` instantiation, reference
``cli/utils/instantiate.py:9-43``): a DOTTED name (``mypkg.blocks.MyBlock``)
resolves by import — so configs can name classes the registry has never
heard of — behind a safety gate: instantiating an arbitrary import path from
a config file is code execution, so it is opt-in via
:func:`allow_imports` (the CLI's ``--trust-imports`` / config
``trust_imports: true``) or by listing trusted top-level packages in the
``NOTORCH_TPU_TRUSTED_MODULES`` env var (comma-separated). Hydra itself has
no such gate; we refuse by default.
"""

from __future__ import annotations

import importlib
import os
from typing import Any, Callable

import optax

REGISTRY: dict[str, Callable] = {}

_ALLOW_IMPORTS = False


def allow_imports(flag: bool = True) -> None:
    """Globally permit dotted-path config resolution (see module docstring)."""
    global _ALLOW_IMPORTS
    _ALLOW_IMPORTS = bool(flag)


def register(name: str, fn: Callable | None = None):
    if fn is not None:
        REGISTRY[name] = fn
        return fn

    def deco(f):
        REGISTRY[name] = f
        return f

    return deco


def _resolve_import(path: str) -> Callable:
    top = path.split(".", 1)[0]
    trusted = {
        r.strip()
        for r in os.environ.get("NOTORCH_TPU_TRUSTED_MODULES", "").split(",")
        if r.strip()
    }
    if not (_ALLOW_IMPORTS or top in trusted):
        raise PermissionError(
            f"config names the import path {path!r}, but arbitrary-class "
            "instantiation is disabled (it executes code named by the "
            "config). Enable it with notorch_tpu.cli.registry.allow_imports()"
            ", the CLI's --trust-imports / trust_imports: true, or list "
            f"trusted packages in NOTORCH_TPU_TRUSTED_MODULES (e.g. {top!r})."
        )
    module_path, _, attr = path.rpartition(".")
    obj = importlib.import_module(module_path)
    try:
        return getattr(obj, attr)
    except AttributeError:
        raise KeyError(f"module {module_path!r} has no attribute {attr!r}") from None


def resolve(name: str) -> Callable:
    try:
        return REGISTRY[name]
    except KeyError:
        pass
    if "." in name:
        return _resolve_import(name)
    raise KeyError(f"unknown component {name!r}; known: {sorted(REGISTRY)}")


def build(spec: dict | str) -> Any:
    """Build a component from ``{"class": name, "args": {...}}`` (or a bare
    name). Nested ``{"class": ...}`` dicts in args are built recursively."""
    if isinstance(spec, str):
        return resolve(spec)()
    kwargs = {}
    for k, v in (spec.get("args") or {}).items():
        if isinstance(v, dict) and "class" in v:
            v = build(v)
        kwargs[k] = v
    return resolve(spec["class"])(**kwargs)


def _populate() -> None:
    from notorch_tpu.nn import agg, attention, attention_dense, glue, mlp, moe, rbf
    from notorch_tpu.nn.chemprop import ChempropBlock, ChempropLayer
    from notorch_tpu.nn.chemprop_dense import (
        DenseChempropBlock,
        DenseGraphEmbedding,
        DenseMax,
        DenseMean,
        DenseSum,
        FusedDenseChempropBlock,
    )
    from notorch_tpu.nn.embed import GraphEmbedding
    from notorch_tpu.nn.spatial import agg as spatial_agg
    from notorch_tpu.nn.spatial.gvp import GvpGNNBlock
    from notorch_tpu.nn.spatial.painn import GatedEquivariantBlock
    from notorch_tpu.nn.spatial.pointwise import Pointwise, PointwiseEmbed
    from notorch_tpu.nn.spatial.schnet import SchnetBlock
    from notorch_tpu.tasks import losses, metrics
    from notorch_tpu.transforms import (
        MolToFP,
        MolToGraph,
        MultiTypeAtomTransform,
        MultiTypeBondTransform,
        Pipeline,
        SmiToMol,
    )
    from notorch_tpu.transforms.point_cloud import MolToPointCloud
    from notorch_tpu.transforms.reaction import RxnToGraph

    for cls in [
        ChempropBlock,
        ChempropLayer,
        GraphEmbedding,
        DenseChempropBlock,
        DenseGraphEmbedding,
        DenseSum,
        DenseMean,
        DenseMax,
        FusedDenseChempropBlock,
        GvpGNNBlock,
        GatedEquivariantBlock,
        SchnetBlock,
        Pointwise,
        PointwiseEmbed,
        mlp.MLP,
        rbf.RBFEmbedding,
        attention.GATv2Layer,
        attention.GraphSelfAttention,
        attention.GATBlock,
        attention_dense.DenseGraphSelfAttention,
        attention_dense.DenseGATBlock,
        moe.MixtureOfExperts,
        moe.MoEMLP,
        moe.DenseRouter,
        moe.SparseRouter,
        glue.Add,
        glue.Mul,
        glue.Cat,
        glue.Split,
        glue.MatMul,
        glue.Einsum,
        glue.Identity,
        glue.BatchNorm,
        glue.Residual,
        MolToGraph,
        MolToFP,
        SmiToMol,
        RxnToGraph,
        MolToPointCloud,
        MultiTypeAtomTransform,
        MultiTypeBondTransform,
        Pipeline,
    ]:
        register(cls.__name__, cls)

    register("Sum", agg.Sum)
    register("Mean", agg.Mean)
    register("Max", agg.Max)
    register("Gated", agg.Gated)
    register("SDPAttention", agg.SDPAttention)
    register("SpatialSum", spatial_agg.Sum)
    register("SpatialMean", spatial_agg.Mean)
    register("SpatialMax", spatial_agg.Max)
    register("SpatialGated", spatial_agg.Gated)

    for name in [
        "MSE",
        "MAE",
        "BoundedMSE",
        "BoundedMAE",
        "MeanVarianceEstimation",
        "MVE",
        "Evidential",
        "BinaryCrossEntropy",
        "BCE",
        "CrossEntropy",
        "XENT",
        "Dirichlet",
        "RankNContrastLoss",
        "SelfSupervisedLoss",
    ]:
        register(name, getattr(losses, name))
    for name in ["RMSE", "R2", "Accuracy", "AUROC", "AUPRC", "F1"]:
        register(name, getattr(metrics, name))
    register("MetricMAE", metrics.MAE)

    register("adam", optax.adam)
    register("adamw", optax.adamw)
    register("sgd", optax.sgd)


_populate()

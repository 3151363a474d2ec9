"""Name -> class registry for config-driven model composition.

The reference's UX is "models as config files" via Hydra ``_target_`` paths
(reference cli/train.py:17-37). Here the registry plays that role: every
module, loss, metric, transform, aggregation, router, and optimizer the
framework ships is constructible by name from YAML/JSON.
"""

from __future__ import annotations

from typing import Any, Callable

import optax

REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable | None = None):
    if fn is not None:
        REGISTRY[name] = fn
        return fn

    def deco(f):
        REGISTRY[name] = f
        return f

    return deco


def resolve(name: str) -> Callable:
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown component {name!r}; known: {sorted(REGISTRY)}"
        ) from None


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
    from notorch_tpu.nn import agg, attention, glue, mlp, moe, rbf
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

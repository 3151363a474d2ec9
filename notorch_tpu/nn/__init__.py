"""Neural-network modules (flax linen) over the batched graph/point-cloud
pytrees. Unlike the reference's commented-out ``nn/__init__`` (all access by
full path), the common surface is exported here."""

from notorch_tpu.nn.agg import Gated, Max, Mean, SDPAttention, Sum
from notorch_tpu.nn.attention import GATv2Layer, GraphSelfAttention
from notorch_tpu.nn.chemprop import ChempropBlock, ChempropLayer
from notorch_tpu.nn.chemprop_dense import (
    DenseChempropBlock,
    DenseGraphEmbedding,
    DenseMax,
    DenseMean,
    DenseSum,
    FusedDenseChempropBlock,
)
from notorch_tpu.nn.embed import EmbeddingBagSum, GraphEmbedding
from notorch_tpu.nn.glue import Add, BatchNorm, Cat, Einsum, Identity, MatMul, Mul, Residual, Split
from notorch_tpu.nn.mlp import MLP
from notorch_tpu.nn.moe import DenseRouter, MixtureOfExperts, SparseRouter
from notorch_tpu.nn.rbf import RBFEmbedding

__all__ = [
    "Add",
    "BatchNorm",
    "Cat",
    "ChempropBlock",
    "ChempropLayer",
    "DenseChempropBlock",
    "DenseGraphEmbedding",
    "DenseMax",
    "DenseMean",
    "DenseRouter",
    "DenseSum",
    "Einsum",
    "EmbeddingBagSum",
    "FusedDenseChempropBlock",
    "GATv2Layer",
    "Gated",
    "GraphEmbedding",
    "GraphSelfAttention",
    "Identity",
    "MLP",
    "MatMul",
    "Max",
    "Mean",
    "MixtureOfExperts",
    "Mul",
    "RBFEmbedding",
    "Residual",
    "SDPAttention",
    "SparseRouter",
    "Split",
    "Sum",
]

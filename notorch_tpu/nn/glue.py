"""Tensor-plumbing modules so wiring itself is expressible in model configs.

Capability parity: reference ``notorch/nn/ops.py`` (Add/Mul/Cat/Split/MatMul/
Einsum) and ``notorch/nn/residual.py`` — tiny named modules for the key-space
DAG.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Add(nn.Module):
    @nn.compact
    def __call__(self, *inputs, training: bool = False):
        out = inputs[0]
        for x in inputs[1:]:
            out = out + x
        return out


class Mul(nn.Module):
    @nn.compact
    def __call__(self, *inputs, training: bool = False):
        out = inputs[0]
        for x in inputs[1:]:
            out = out * x
        return out


class Cat(nn.Module):
    axis: int = -1

    @nn.compact
    def __call__(self, *inputs, training: bool = False):
        return jnp.concatenate(inputs, axis=self.axis)


class Split(nn.Module):
    sizes: Sequence[int] = ()
    axis: int = -1

    @nn.compact
    def __call__(self, x, training: bool = False):
        indices = list(jnp.cumsum(jnp.asarray(self.sizes))[:-1])
        return tuple(jnp.split(x, indices, axis=self.axis))


class MatMul(nn.Module):
    @nn.compact
    def __call__(self, a, b, training: bool = False):
        return a @ b


class Einsum(nn.Module):
    equation: str = "ij,jk->ik"

    @nn.compact
    def __call__(self, *operands, training: bool = False):
        return jnp.einsum(self.equation, *operands)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        return x


class BatchNorm(nn.Module):
    """Inference-friendly feature normalization for concat-readout heads
    (reference ``MulticomponentMPNN`` applies BatchNorm to fingerprints,
    multi.py:44). Uses batch statistics during training and running averages
    otherwise, carried in the ``batch_stats`` collection."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, training: bool = False):
        return nn.BatchNorm(
            use_running_average=not training, momentum=self.momentum, epsilon=self.epsilon
        )(x)


class Residual(nn.Module):
    """``x + module(x, ...)`` wrapper (reference residual.py:10-28)."""

    module: nn.Module

    @nn.compact
    def __call__(self, *inputs, training: bool = False):
        return inputs[0] + self.module(*inputs, training=training)

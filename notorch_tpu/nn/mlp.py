"""Configurable MLP head.

Capability parity: reference ``notorch/nn/mlp.py:9-68`` — dropout-first blocks
``[Dropout, Dense, act] * L`` with the leading dropout and trailing activation
stripped, plus optional unflatten of the output (e.g. ``[t, 2]`` MVE heads).
"""

from __future__ import annotations

from collections.abc import Sequence
from math import prod
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from notorch_tpu.conf import DEFAULT_HIDDEN_DIM


class MLP(nn.Module):
    input_dim: int  # kept for config parity; linen infers input width
    output_size: int | Sequence[int] = 1
    hidden_dim: int = DEFAULT_HIDDEN_DIM
    num_layers: int = 1
    dropout: float = 0.0
    activation: Callable = nn.relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if isinstance(self.output_size, int):
            output_dim, unflatten = self.output_size, None
        else:
            output_dim, unflatten = prod(self.output_size), tuple(self.output_size)

        dims = [self.hidden_dim] * self.num_layers + [output_dim]
        h = x
        for i, d in enumerate(dims):
            if i > 0:
                h = self.activation(h)
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
            h = nn.Dense(d, dtype=self.dtype, name=f"dense_{i}")(h)
        if unflatten is not None:
            h = h.reshape(h.shape[:-1] + unflatten)
        return h

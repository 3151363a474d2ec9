"""PaiNN gated equivariant block.

Capability parity: reference ``notorch/nn/spatial/painn/geb.py:8-63``
(arXiv:2102.03150): mixes scalar and vector channels — two vector channel
mixings, scalar MLP over [scalars | mixed-vector norms], output split into a
scalar update and a gate that scales the second vector mixing.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

EPS = 1e-8


class GatedEquivariantBlock(nn.Module):
    scalar_dim: int
    vector_dim: int
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sv: tuple[jnp.ndarray, jnp.ndarray], training: bool = False):
        s, v = sv  # [N, ds], [N, 3, dv]
        w1 = nn.Dense(self.vector_dim, use_bias=False, dtype=self.dtype, name="W_1")(v)
        w2 = nn.Dense(self.vector_dim, use_bias=False, dtype=self.dtype, name="W_2")(v)
        norms = jnp.sqrt((w1**2).sum(axis=-2) + EPS)  # [N, dv]

        h = jnp.concatenate([s, norms], axis=-1)
        h = nn.Dense(self.scalar_dim + self.vector_dim, dtype=self.dtype, name="mlp_0")(h)
        h = self.act(h)
        h = nn.Dense(self.scalar_dim + self.vector_dim, dtype=self.dtype, name="mlp_1")(h)

        s_out, gate = h[..., : self.scalar_dim], h[..., self.scalar_dim :]
        v_out = w2 * gate[..., None, :]
        return s_out, v_out


GEB = GatedEquivariantBlock

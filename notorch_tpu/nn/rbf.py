"""Gaussian radial basis expansion of interatomic distances.

Capability parity: reference ``notorch/nn/rbf.py:7-29`` (with the
``self.factor``/``self.width`` naming bug fixed: the Gaussian width is
``(cutoff - start) / num_bases``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class RBFEmbedding(nn.Module):
    start: float = 0.0
    cutoff: float = 5.0
    num_bases: int = 16

    @nn.compact
    def __call__(self, dists: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        """``[...]`` distances -> ``[..., num_bases]`` Gaussian features."""
        centers = jnp.linspace(self.start, self.cutoff, self.num_bases)
        width = (self.cutoff - self.start) / self.num_bases
        diff = dists[..., None] - centers
        return jnp.exp(-0.5 * (diff / width) ** 2)
